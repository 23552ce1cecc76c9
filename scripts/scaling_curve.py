"""Measure operator growth on 1x/8x/64x inflated corpora (SCALE.md).

Builds deterministic inflations of the sf0.1 documents+embeddings
tables under /tmp (never touches /root/testdata), times the headline
dedup/ANN queries at each factor, and prints a markdown table with the
fitted growth exponent alpha where time ~ N^alpha (alpha from the
1x -> 64x endpoints; 1.0 = linear).

Usage: python scripts/scaling_curve.py [--sf /root/testdata/sf0.1]
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
QUERIES = (
    "t3_minhash_lsh_pairs",
    "t10_dedup_clusters",
    "t11_ngram_jaccard",
    "t14_containment",
    "t26_canonical_dedup",
    "v2_knn_bucketed",
    "v4_knn_ivf",
    "v12_knn_ivf_pq",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args()

    from lp_etl_plugins_spark import inventory, scaling
    from lp_etl_plugins_spark.inventory import textops as it
    from lp_etl_plugins_spark.inventory import vectorops as iv
    from lp_etl_plugins_spark.session import get_spark
    from lp_etl_plugins_spark.tables import load_table

    spark = get_spark("scaling-curve", cpus=os.cpu_count() or 8)
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="scaling_")
    dirs: dict[int, str] = {}
    for f in FACTORS:
        d = os.path.join(base, f"x{f}")
        os.makedirs(d, exist_ok=True)
        scaling.inflate_documents(
            load_table(spark, args.sf, "documents"), f
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        scaling.inflate_embeddings(
            load_table(spark, args.sf, "embeddings"), f
        ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
        dirs[f] = d
        print(f"# built x{f} corpus at {d}", file=sys.stderr)

    queries = inventory.all_queries()

    def run_once(name: str, sf_dir: str) -> float:
        # fresh substrate per (factor, query-family) measurement: the
        # shared dedup/neardup caches would otherwise attribute the
        # whole build to the first query of a factor
        it._INDEXES.clear()
        it._GRAM_INDEXES.clear()
        iv._NEARDUP_CACHE.clear()
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm-up: JVM + parquet reader on the smallest corpus
    run_once(QUERIES[0], dirs[FACTORS[0]])

    results: dict[str, dict[int, float]] = {}
    for name in QUERIES:
        results[name] = {}
        for f in FACTORS:
            secs = min(run_once(name, dirs[f]) for _ in range(2 if f <= 8 else 1))
            results[name][f] = round(secs, 3)
            print(f"# {name} x{f}: {secs:.2f}s", file=sys.stderr)

    print("| query | 1x (s) | 8x (s) | 64x (s) | alpha |")
    print("|---|---|---|---|---|")
    rows = {}
    for name in QUERIES:
        r = results[name]
        alpha = math.log(r[64] / r[1]) / math.log(64)
        rows[name] = {"t1": r[1], "t8": r[8], "t64": r[64], "alpha": round(alpha, 2)}
        print(f"| {name} | {r[1]:.2f} | {r[8]:.2f} | {r[64]:.2f} | {alpha:.2f} |")

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(rows, fh, indent=1)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
