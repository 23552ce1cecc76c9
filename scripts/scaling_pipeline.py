"""End-to-end pipeline scaling: curate_corpus on 1x/8x/64x corpora.

The per-operator curve (scaling_curve.py) clears every cache between
points — the full from-scratch cost of each operator. This measures
what a real pipeline PAYS: one curate_corpus run per factor (ingest →
lang → quality → redact → exact dedup → near-dup canonicalization via
the shared DedupIndex → decontaminate → partitioned write → reload →
pack → write manifests), end-to-end wall clock including both writes,
with the index built once inside the run (shared-index mode).

Usage: python scripts/scaling_pipeline.py [--sf /root/testdata/sf0.1]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args()

    from lp_etl_plugins_spark import curation, scaling
    from lp_etl_plugins_spark.session import get_spark
    from lp_etl_plugins_spark.tables import load_table

    spark = get_spark("scaling-pipeline", cpus=os.cpu_count() or 8)
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="scaling_pipe_")
    dirs: dict[int, str] = {}
    for f in FACTORS:
        d = os.path.join(base, f"x{f}")
        os.makedirs(d, exist_ok=True)
        scaling.inflate_documents(
            load_table(spark, args.sf, "documents"), f
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        dirs[f] = d
        print(f"# built x{f} corpus at {d}", file=sys.stderr)

    # Inflation prefixes every word (disjoint replica vocabularies), so
    # the stopword-driven lang/quality filters would drop EVERYTHING on
    # an inflated corpus; run keep-all filter settings (lang_id is
    # 'unknown' for all prefixed docs, threshold 0) — every stage still
    # executes over the full corpus, which is what the curve measures.
    kw = dict(lang="unknown", min_quality=0.0, redact=True, pack_capacity=512)

    # warm-up: JVM + parquet reader + one tiny pipeline
    curation.curate_corpus(spark, dirs[1], os.path.join(base, "warm"), **kw)

    results: dict[int, dict] = {}
    for f in FACTORS:
        out = os.path.join(base, f"curated_x{f}")
        t0 = time.perf_counter()
        res = curation.curate_corpus(spark, dirs[f], out, **kw)
        secs = time.perf_counter() - t0
        results[f] = {"secs": round(secs, 2), "metrics": res["metrics"]}
        print(f"# curate_corpus x{f}: {secs:.2f}s {res['metrics']}", file=sys.stderr)

    print("| pipeline | 1x (s) | 8x (s) | 64x (s) | alpha |")
    print("|---|---|---|---|---|")
    alpha = math.log(results[64]["secs"] / results[1]["secs"]) / math.log(64)
    print(
        f"| curate_corpus (redact+pack, shared index) | {results[1]['secs']:.2f} "
        f"| {results[8]['secs']:.2f} | {results[64]['secs']:.2f} | {alpha:.2f} |"
    )
    rows_out = {str(f): results[f] for f in FACTORS}
    rows_out["alpha"] = round(alpha, 2)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(rows_out, fh, indent=1)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
