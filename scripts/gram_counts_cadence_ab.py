"""gram_counts maintenance-cadence A/B (round 11 — VERDICT r10 Next #5).

Round 10 added the `gram_counts` substrate so RepeatIndex retraction
locates by layout instead of scanning; `build()` now pays its write
(one groupBy over the just-sealed postings). The driver's r10 artifact
showed t42 flat (5.14 → 5.12 s) while the local artifact showed
3.56 → 5.45 s — ambient-ambiguous. This measures the question
directly at ×1 and ×8 corpus inflation:

- t_build        : the full build() as shipped (postings + spans +
                   gram_counts);
- t_counts       : JUST the gram_counts aggregation+write over the
                   sealed postings (re-run on the built index —
                   exactly the increment build pays);
- counts share   : t_counts / t_build — the fraction a
                   compact-maintained-only cadence would defer.

Decision rule (SCALE.md): move the write to compact() only if the
share is material (>15%) at ×8 — the exact-scan fallback already
covers a counts-less index, so the move is semantics-free.

Usage: python scripts/gram_counts_cadence_ab.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--factors", default="1,8")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lp_etl_plugins_spark import scaling
    from lp_etl_plugins_spark.session import get_spark
    from lp_etl_plugins_spark.tables import load_table
    from lp_etl_plugins_spark.textops import RepeatIndex

    spark = get_spark("gram_counts_ab", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, args.sf, "documents")
    rows = []
    for f in (int(x) for x in args.factors.split(",")):
        docs = scaling.inflate_documents(docs0, f).select(
            F.col("doc_id"), F.col("text")
        ).localCheckpoint()
        tmp = tempfile.mkdtemp(prefix=f"gc_ab_x{f}_")
        t0 = time.perf_counter()
        RepeatIndex.build(spark, docs, tmp)
        t_build = time.perf_counter() - t0
        # the increment in isolation: recount gram_counts from the
        # sealed postings (identical job to build's final step)
        t0 = time.perf_counter()
        spark.read.schema(RepeatIndex._POST_SCHEMA).parquet(
            f"{tmp}/postings"
        ).groupBy("g").agg(F.count(F.lit(1)).alias("c")).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/gram_counts")
        t_counts = time.perf_counter() - t0
        rows.append((f, t_build, t_counts, t_counts / t_build))
        print(
            f"x{f}: build={t_build:.2f}s  gram_counts step={t_counts:.2f}s "
            f"share={t_counts / t_build:.1%}",
            flush=True,
        )
    print("| factor | build (s) | gram_counts step (s) | share |")
    print("|---|---|---|---|")
    for f, tb, tc, sh in rows:
        print(f"| ×{f} | {tb:.2f} | {tc:.2f} | {sh:.1%} |")
    print(json.dumps({f"x{f}": {"build": round(tb, 2), "counts": round(tc, 2)}
                      for f, tb, tc, _ in rows}))


if __name__ == "__main__":
    main()
