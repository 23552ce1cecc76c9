"""A/B for the round-11 serving-read pruning (VERDICT r10 Next #1/#2).

Two changes, measured at sf0.1 against the exact old plan shapes:

A) `search_rerank` refine stage, three shapes:
   - OLD (r10): the SQ8 reconstruction projection ran over the FULL
     codes stage per query batch (the r10 judge's plan defect —
     O(corpus) interpreted zip_with arithmetic, then the shortlist
     join discarded everything). Reimplemented verbatim here.
   - NEW default (lazy): sq8_codes semi-joined against the broadcast
     distinct shortlist ids BEFORE recon — O(shortlist) compute, one
     job, exchange-reused stage 1.
   - NEW large-stage tier (forced via _PRUNE_STAGE_BYTES=0): the
     shortlist ids additionally push as literal-IN so parquet file
     stats prune the refine READ — pays ~1 extra driver job, engages
     automatically only when the stage dir is >= 256 MB.

B) `search` stage-1 codes read — legacy layout (no bucket column,
   full codes scan) vs the bucket layout's lazy default vs its
   forced literal-IN bucket pruning.

All shapes assert identical results. Min-of-3 warm timings; results
to SCALE.md / BASELINE.md.
Usage: python scripts/rerank_prune_ab.py [--sf /root/testdata/sf0.1]
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
    args = ap.parse_args()

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from lp_etl_plugins_spark.session import get_spark
    from lp_etl_plugins_spark.tables import load_table
    from lp_etl_plugins_spark.vectorops import VectorIndex

    spark = get_spark("rerank_ab", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, args.sf, "embeddings")
    probes = (
        emb.orderBy("vec_id")
        .limit(8)
        .select((F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
        .localCheckpoint()
    )
    tmp = tempfile.mkdtemp(prefix="rerank_ab_")
    try:
        idx = VectorIndex(emb, m=16)
        idx.sq8_codes  # materialize refine stages (the opt-in)
        idx.save(f"{tmp}/new")
        # legacy-layout copy: identical rows, bucket column stripped,
        # sq8_codes unsorted (shuffled file order via repartition)
        shutil.copytree(f"{tmp}/new", f"{tmp}/old")
        codes = spark.read.parquet(f"{tmp}/new/codes").drop("bucket")
        codes.repartition(32).write.mode("overwrite").parquet(
            f"{tmp}/old/codes"
        )
        sq8 = spark.read.parquet(f"{tmp}/new/sq8_codes")
        sq8.repartition(32).write.mode("overwrite").parquet(
            f"{tmp}/old/sq8_codes"
        )
        new = VectorIndex.load(spark, f"{tmp}/new")
        old = VectorIndex.load(spark, f"{tmp}/old")

        def rerank_old_shape(ix, pr, k, nprobe=8, shortlist=128):
            """The r10 plan verbatim: recon over the FULL codes stage,
            shortlist join above it."""
            sl = ix.search(pr, shortlist, nprobe=nprobe).select(
                "probe_id", "neighbor_id"
            )
            cb = ix.sq8_cb
            recon = F.zip_with(
                F.zip_with(F.col("q"), F.col("step"), lambda q, s: q * s),
                F.col("lo"),
                lambda x, l: x + l,
            )
            rv = (
                ix.sq8_codes.withColumnRenamed("id", "neighbor_id")
                .crossJoin(F.broadcast(cb))
                .select("neighbor_id", recon.alias("rv"))
            )
            pv = pr.select(
                F.col("vec_id").alias("probe_id"),
                F.transform(
                    F.col("embedding"), lambda x: x.cast("double")
                ).alias("pv"),
            )
            rdist2 = F.round(
                F.aggregate(
                    F.zip_with("pv", "rv", lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            )
            win = W.partitionBy("probe_id").orderBy(
                F.col("rdist2"), F.col("neighbor_id")
            )
            return (
                sl.join(rv, "neighbor_id")
                .join(F.broadcast(pv), "probe_id")
                .select("probe_id", "neighbor_id", rdist2.alias("rdist2"))
                .withColumn("rank", F.row_number().over(win))
                .filter(F.col("rank") <= k)
            )

        # identical results first (the hash-invariance claim)
        a = sorted(tuple(r) for r in rerank_old_shape(old, probes, 3).collect())
        b = sorted(tuple(r) for r in new.search_rerank(probes, 3).collect())
        assert a == b, "A/B results diverge"

        def mo3(fn):
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                fn().collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best

        # the forced large-stage tier: same directory, zero threshold
        forced = VectorIndex.load(spark, f"{tmp}/new")
        forced._PRUNE_STAGE_BYTES = 0
        c = sorted(tuple(r) for r in forced.search_rerank(probes, 3).collect())
        assert a == c, "literal-tier results diverge"

        # warm all shapes
        rerank_old_shape(old, probes, 3).collect()
        new.search_rerank(probes, 3).collect()
        forced.search_rerank(probes, 3).collect()
        t_rr_old = mo3(lambda: rerank_old_shape(old, probes, 3))
        t_rr_new = mo3(lambda: new.search_rerank(probes, 3))
        t_rr_lit = mo3(lambda: forced.search_rerank(probes, 3))

        s_old = sorted(
            tuple(r) for r in old.search(probes, 3, nprobe=2).collect()
        )
        s_new = sorted(
            tuple(r) for r in new.search(probes, 3, nprobe=2).collect()
        )
        s_lit = sorted(
            tuple(r) for r in forced.search(probes, 3, nprobe=2).collect()
        )
        assert s_old == s_new == s_lit, "stage-1 A/B results diverge"
        t_s_old = mo3(lambda: old.search(probes, 3, nprobe=2))
        t_s_new = mo3(lambda: new.search(probes, 3, nprobe=2))
        t_s_lit = mo3(lambda: forced.search(probes, 3, nprobe=2))

        print(
            f"rerank  old(full-corpus recon)={t_rr_old:.3f}s  "
            f"new(join-first recon-above)={t_rr_new:.3f}s  "
            f"literal-tier(forced)={t_rr_lit:.3f}s"
        )
        print(
            f"search  legacy-layout={t_s_old:.3f}s  "
            f"bucket-layout lazy={t_s_new:.3f}s  "
            f"literal-tier(forced)={t_s_lit:.3f}s"
        )
        print(
            json.dumps(
                {
                    "rerank_old": round(t_rr_old, 3),
                    "rerank_new": round(t_rr_new, 3),
                    "rerank_literal": round(t_rr_lit, 3),
                    "search_old": round(t_s_old, 3),
                    "search_new": round(t_s_new, 3),
                    "search_literal": round(t_s_lit, 3),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
