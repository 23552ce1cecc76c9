"""Incremental-update scaling: CurationState.update on growing corpora.

The daily-delta claim (incremental.py) is that absorbing a
FIXED-SIZE delta costs time bounded by the delta plus the old rows
its pairs touch — never by the old corpus. This measures it: for each
inflation factor the script builds the persistent curation state over
the full inflated corpus (the rebuild-cost proxy), then times
``update`` with the SAME 250-document delta (replica-0 originals,
re-identified above the corpus max and perturbed by one appended word,
so every delta doc is a near-dup of an old doc — the expensive case:
banded join against the full index, Jaccard verification touching old
texts, canonical displacement decisions). If the design holds, build
time grows ≈ linearly with the corpus while update time stays ≈ flat.

Usage: python scripts/scaling_incremental.py [--sf /root/testdata/sf0.1]
Prints a markdown table with alpha fitted on the 1x -> 64x endpoints.
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
N_DELTA = 250


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lp_etl_plugins_spark import scaling
    from lp_etl_plugins_spark.incremental import CurationState
    from lp_etl_plugins_spark.session import get_spark
    from lp_etl_plugins_spark.tables import load_table

    spark = get_spark("scaling-incremental", cpus=os.cpu_count() or 8)
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="scaling_inc_")
    dirs: dict[int, str] = {}
    for f in FACTORS:
        d = os.path.join(base, f"x{f}")
        os.makedirs(d, exist_ok=True)
        scaling.inflate_documents(
            load_table(spark, args.sf, "documents"), f
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        dirs[f] = d
        print(f"# built x{f} corpus at {d}", file=sys.stderr)

    # Inflation prefixes every word, so the stopword lang filter would
    # drop everything; keep-all settings (same rationale as
    # scaling_pipeline.py) — every pipeline stage still runs.
    kw = dict(lang="unknown", min_quality=0.0)

    results: dict[int, dict] = {}
    for f in FACTORS:
        docs = spark.read.parquet(os.path.join(dirs[f], "documents.parquet"))
        n_docs = docs.count()
        hi = docs.agg(F.max("doc_id")).first()[0]
        # fixed-size delta: the replica-0 copies of the first N_DELTA
        # originals, re-identified above the corpus max and perturbed
        # by one appended word — near-dups of live old docs
        delta = (
            docs.filter(
                (F.col("doc_id") % f == 0) & (F.col("doc_id") < N_DELTA * f)
            )
            .select(
                (F.col("doc_id") + hi + 1).alias("doc_id"),
                "source",
                F.concat("text", F.lit(" zzdeltamarker")).alias("text"),
            )
            .localCheckpoint()
        )
        state_dir = os.path.join(base, f"state_x{f}")
        t0 = time.perf_counter()
        st = CurationState.build(spark, docs, state_dir, **kw)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        metrics = st.update(delta)
        update_s = time.perf_counter() - t0
        results[f] = {
            "n_docs": n_docs,
            "build_s": round(build_s, 2),
            "update_s": round(update_s, 2),
            "update_metrics": metrics,
        }
        print(f"# x{f}: {results[f]}", file=sys.stderr)
        shutil.rmtree(state_dir, ignore_errors=True)

    lo, hi_f = FACTORS[0], FACTORS[-1]

    def alpha(key: str) -> float:
        return math.log(results[hi_f][key] / results[lo][key]) / math.log(
            hi_f / lo
        )

    print("| factor | docs | build (s) | update, fixed 250-doc delta (s) |")
    print("|---|---|---|---|")
    for f in FACTORS:
        r = results[f]
        print(f"| {f}x | {r['n_docs']} | {r['build_s']} | {r['update_s']} |")
    print(
        f"\nalpha(build) = {alpha('build_s'):.2f}, "
        f"alpha(update) = {alpha('update_s'):.2f} "
        f"(time ~ N^alpha over the {lo}x -> {hi_f}x endpoints)"
    )
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2, default=str)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
