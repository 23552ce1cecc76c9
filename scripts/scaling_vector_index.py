"""Incremental-serving scaling: VectorIndex.update on growing corpora.

The serving-index add() claim (vectorops.VectorIndex.update /
append_saved) is that absorbing a FIXED-SIZE vector delta costs
O(|delta| x codebook) — encode against the frozen quantizers plus two
O(delta) parquet appends — never a corpus re-scan or re-train. This
measures it: for each inflation factor the script builds and saves the
IVF-PQ index over the full inflated corpus (the rebuild-cost proxy),
then times a load() + update() + append_saved() round with the SAME
200-vector delta (re-identified above the corpus max, perturbed
x*1.01+0.001 so the vectors are new but realistically distributed).
If the design holds, build time grows with the corpus while the
fixed-delta update stays ~flat.

Usage: python scripts/scaling_vector_index.py [--sf /root/testdata/sf0.1]
Prints a markdown table plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTORS = (1, 8, 64)
N_DELTA = 200


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lp_etl_plugins_spark import scaling
    from lp_etl_plugins_spark.session import get_spark
    from lp_etl_plugins_spark.tables import load_table
    from lp_etl_plugins_spark.vectorops import VectorIndex

    spark = get_spark("scaling-vector-index", cpus=os.cpu_count() or 8)
    spark.sparkContext.setLogLevel("ERROR")

    emb0 = load_table(spark, args.sf, "embeddings")
    base = tempfile.mkdtemp(prefix="scaling_vidx_")
    rows = []
    try:
        for f in FACTORS:
            corpus_path = os.path.join(base, f"x{f}", "emb")
            scaling.inflate_embeddings(emb0, f).write.mode("overwrite").parquet(
                corpus_path
            )
            corpus = spark.read.parquet(corpus_path)
            n = corpus.count()
            hi = corpus.agg(F.max("vec_id")).first()[0]
            delta = (
                corpus.orderBy("vec_id")
                .limit(N_DELTA)
                .select(
                    (F.col("vec_id") + hi + 1).alias("vec_id"),
                    F.transform(
                        F.col("embedding"), lambda x: x * F.lit(1.01) + F.lit(0.001)
                    ).alias("embedding"),
                )
                .localCheckpoint()
            )
            idx_path = os.path.join(base, f"x{f}", "index")

            t0 = time.perf_counter()
            VectorIndex(corpus).save(idx_path)
            build_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            live = VectorIndex.load(spark, idx_path)
            live.update(delta)
            live.append_saved(idx_path)
            update_s = time.perf_counter() - t0
            rows.append((f, n, round(build_s, 1), round(update_s, 1)))
            print(
                f"| {f}x | {n} | {build_s:.1f} | {update_s:.1f} |",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)

    span = math.log(FACTORS[-1] / FACTORS[0])
    a_build = math.log(rows[-1][2] / rows[0][2]) / span
    a_update = math.log(rows[-1][3] / rows[0][3]) / span
    print(
        json.dumps(
            {
                "sf": args.sf,
                "n_delta": N_DELTA,
                "rows": [
                    {"factor": f, "vectors": n, "build_s": b, "update_s": u}
                    for (f, n, b, u) in rows
                ],
                "alpha_build": round(a_build, 2),
                "alpha_update": round(a_update, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
