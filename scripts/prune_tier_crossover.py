"""Crossover proof for the size-gated literal scan tier (round 11).

The A/B at sf0.1 (`rerank_prune_ab.py`) shows the literal-IN tier's
~0.5 s fixed driver cost LOSING on a megabyte-scale stage — which is
why it is gated at ``_PRUNE_STAGE_BYTES``. This script builds the
other side of the story: an sq8_codes stage INFLATED past the gate
(replicated corpus vectors under fresh ids, ~64× sf0.1 ≈ hundreds of
MB) and measures the same three shapes there. Expected: the literal
tier's file pruning beats the lazy semi-join's full scan, and both
beat the r10 corpus-wide recon — i.e. the gate engages exactly where
it wins.

Usage: python scripts/prune_tier_crossover.py [--sf /root/testdata/sf0.1]
       [--factor 64]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=64)
    ap.add_argument(
        "--gate-mb", type=int, default=None,
        help="override the auto side's _PRUNE_STAGE_BYTES (MB) to probe "
        "the crossover below the production default",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lp_etl_plugins_spark import scaling
    from lp_etl_plugins_spark.session import get_spark
    from lp_etl_plugins_spark.tables import load_table
    from lp_etl_plugins_spark.vectorops import VectorIndex

    spark = get_spark("prune_crossover", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = scaling.inflate_embeddings(
        load_table(spark, args.sf, "embeddings"), args.factor
    ).localCheckpoint()
    n = emb.count()
    probes = (
        emb.orderBy("vec_id")
        .limit(8)
        .select((F.col("vec_id") + (1 << 40)).alias("vec_id"), "embedding")
        .localCheckpoint()
    )
    tmp = tempfile.mkdtemp(prefix="prune_crossover_")
    try:
        idx = VectorIndex(emb, m=16)
        idx.sq8_codes
        idx.save(f"{tmp}/idx")

        def stage_mb(stage):
            d = f"{tmp}/idx/{stage}"
            return sum(
                e.stat().st_size for e in os.scandir(d) if e.is_file()
            ) / (1 << 20)

        print(
            f"corpus={n} rows; codes={stage_mb('codes'):.0f} MB; "
            f"sq8_codes={stage_mb('sq8_codes'):.0f} MB "
            f"(gate {VectorIndex._PRUNE_STAGE_BYTES >> 20} MB)"
        )
        auto = VectorIndex.load(spark, f"{tmp}/idx")
        if args.gate_mb is not None:
            auto._PRUNE_STAGE_BYTES = args.gate_mb << 20
        lazy = VectorIndex.load(spark, f"{tmp}/idx")
        lazy._PRUNE_STAGE_BYTES = 1 << 60  # force the lazy tier off-gate

        def mo3(fn):
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                fn().collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best

        a = sorted(tuple(r) for r in auto.search_rerank(probes, 3).collect())
        b = sorted(tuple(r) for r in lazy.search_rerank(probes, 3).collect())
        assert a == b, "tiers diverge"
        t_rr_auto = mo3(lambda: auto.search_rerank(probes, 3))
        t_rr_lazy = mo3(lambda: lazy.search_rerank(probes, 3))
        sa = sorted(tuple(r) for r in auto.search(probes, 3, nprobe=2).collect())
        sb = sorted(tuple(r) for r in lazy.search(probes, 3, nprobe=2).collect())
        assert sa == sb
        t_s_auto = mo3(lambda: auto.search(probes, 3, nprobe=2))
        t_s_lazy = mo3(lambda: lazy.search(probes, 3, nprobe=2))
        gate_on = auto._prune_stage("sq8_codes")
        print(
            f"rerank  lazy(full scan)={t_rr_lazy:.2f}s  "
            f"auto(gate {'ON' if gate_on else 'off'})={t_rr_auto:.2f}s  "
            f"speedup={t_rr_lazy / t_rr_auto:.2f}x"
        )
        print(
            f"search  lazy(full scan)={t_s_lazy:.2f}s  "
            f"auto={t_s_auto:.2f}s  speedup={t_s_lazy / t_s_auto:.2f}x"
        )
        print(
            json.dumps(
                {
                    "factor": args.factor,
                    "rows": n,
                    "sq8_mb": round(stage_mb("sq8_codes")),
                    "codes_mb": round(stage_mb("codes")),
                    "gate_engaged": gate_on,
                    "rerank_lazy": round(t_rr_lazy, 2),
                    "rerank_auto": round(t_rr_auto, 2),
                    "search_lazy": round(t_s_lazy, 2),
                    "search_auto": round(t_s_auto, 2),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
