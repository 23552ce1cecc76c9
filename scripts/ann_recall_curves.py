"""Recall-vs-cost curves for the compressed ANN family (VERDICT r7 #4).

v8 gates recall for the bucketed variant only. This script measures
recall@k against the exact baseline UNDER EACH VARIANT'S OWN METRIC —
the comparison is only meaningful metric-for-metric:

- cosine family (knn_bucketed, knn_ivf × nprobe): vs knn_bruteforce;
- L2/ADC family (knn_pq, knn_ivf_pq × nprobe, VectorIndex serving,
  and the v16-updated VectorIndex): vs knn_bruteforce_l2;
- dot family (knn_sq8): vs an exact-dot top-k (same plan, no
  quantization).

Cost column: the candidate fraction — candidate pairs scored per
probe divided by the corpus size (1.0 = full scan; the compression
variants' payload-per-candidate savings are noted, not timed — wall
times at sf0.1 are scheduling-bound and would misstate the 100 TB
trade-off, where candidate volume × payload is the real cost).

Usage: python scripts/ann_recall_curves.py [--sf /root/testdata/sf0.1]
Prints a markdown table (paste into SCALE.md) plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 3
PROBE_LIMIT = 10


def _exact_dot_topk(V, F, W, emb, probes, k):
    p = probes.select(
        F.col("vec_id").alias("probe_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("pv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("cv"),
    )
    pairs = c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id"))
    adot = F.round(V.dot(F.col("pv"), F.col("cv")), 6)
    win = W.partitionBy("probe_id").orderBy(
        F.col("adot").desc(), F.col("neighbor_id")
    )
    return (
        pairs.select("probe_id", "neighbor_id", adot.alias("adot"))
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )


def recall_at_k(exact, approx, k) -> float:
    """Mean per-probe |approx ∩ exact| / k (zero-overlap probes count
    at 0)."""
    from pyspark.sql import functions as F

    e = exact.select("probe_id", "neighbor_id")
    a = approx.select("probe_id", "neighbor_id").withColumn("hit", F.lit(1))
    per = (
        e.join(a, ["probe_id", "neighbor_id"], "left")
        .groupBy("probe_id")
        .agg((F.sum(F.coalesce("hit", F.lit(0))) / F.lit(k)).alias("r"))
    )
    return float(per.agg(F.avg("r")).first()[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from lp_etl_plugins_spark import vectorops as V
    from lp_etl_plugins_spark.inventory.vectorops import _emb, _external_probes
    from lp_etl_plugins_spark.session import get_spark

    spark = get_spark("ann-recall", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    emb = _emb(spark, args.sf).localCheckpoint()
    n_corpus = emb.count()
    probes = emb.filter(F.col("vec_id") < PROBE_LIMIT)
    ext = _external_probes(emb)
    n_lists = emb.select("label").distinct().count()

    exact_cos = V.knn_bruteforce(emb, probes, K).localCheckpoint()
    exact_l2 = V.knn_bruteforce_l2(emb, probes, K).localCheckpoint()
    exact_l2_ext = V.knn_bruteforce_l2(
        emb, ext, K, exclude_self=False
    ).localCheckpoint()
    exact_dot = _exact_dot_topk(V, F, W, emb, probes, K).localCheckpoint()

    rows = []

    def add(variant, knob, metric, exact, approx, cand_frac):
        r = recall_at_k(exact, approx, K)
        rows.append((variant, knob, metric, round(r, 4), round(cand_frac, 4)))
        print(f"# {variant} {knob}: recall@{K}={r:.4f}", file=sys.stderr)

    add("knn_bucketed", "bits=3", "cosine", exact_cos,
        V.knn_bucketed(emb, probes, K, bits=3), 1 / 8)
    for nprobe in (1, 2, 3):
        add("knn_ivf", f"nprobe={nprobe}", "cosine", exact_cos,
            V.knn_ivf(emb, probes, K, nprobe=nprobe), nprobe / n_lists)
    add("knn_pq", "m=4", "L2/ADC", exact_l2,
        V.knn_pq(emb, probes, K, m=4, dims=64), 1.0)
    for nprobe in (1, 2, 3):
        add("knn_ivf_pq", f"nprobe={nprobe}", "L2/ADC", exact_l2,
            V.knn_ivf_pq(emb, probes, K, m=4, dims=64, nprobe=nprobe),
            nprobe / n_lists)
    add("knn_sq8", "8-bit", "dot", exact_dot, V.knn_sq8(emb, probes, K), 1.0)

    built = V.VectorIndex(emb)
    for nprobe in (1, 2, 3):
        add("VectorIndex.search", f"nprobe={nprobe}", "L2/ADC", exact_l2_ext,
            built.search(ext, K, nprobe=nprobe), nprobe / n_lists)
    base = emb.filter(F.col("vec_id") % 8 != 7)
    upd = V.VectorIndex(base).update(emb.filter(F.col("vec_id") % 8 == 7).drop("label"))
    add("VectorIndex v16-updated", "nprobe=2", "L2/ADC", exact_l2_ext,
        upd.search(ext, K, nprobe=2), 2 / n_lists)

    print(f"\n### ANN recall@{K} vs cost ({args.sf}, {n_corpus} vectors, "
          f"{n_lists} coarse lists)\n")
    print("| variant | knob | metric (vs exact same-metric top-k) | "
          f"recall@{K} | candidate fraction |")
    print("|---|---|---|---|---|")
    for v, kn, m, r, c in rows:
        print(f"| {v} | {kn} | {m} | {r} | {c} |")
    print()
    print(json.dumps({
        "sf": args.sf, "k": K, "n_corpus": n_corpus,
        "rows": [dict(zip(("variant", "knob", "metric", "recall", "cand_frac"), r))
                 for r in rows],
    }))


if __name__ == "__main__":
    main()
