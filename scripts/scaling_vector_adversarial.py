"""VectorIndex under a clustered-embedding adversary (VERDICT r8 #7).

text/media/curation have their adversarial-skew measurements; this
closes the vector family. The adversary: a corpus whose vectors
collapse onto ONE point, so one coarse list holds ~everything and
every probe's candidate set is ~the corpus — the worst case for an
IVF serving index (nprobe stops pruning).

Construction (deterministic, from sf0.1 embeddings): 95% of vectors
become a tiny cloud around a single point under label 0 (their list),
5% are flung to distinct far corners under labels 1–9 — the trained
coarse centroids then put ~95% of the corpus in list 0, and probes
drawn near the cloud fan into exactly that list. Inflation 1×/8×/64×
replicates with id offsets and a deterministic perturbation.

What to verify (and what NOT to expect):

- STRUCTURAL skew-immunity of the serving plan: `search` broadcasts
  the probe fan into `corpus_lists` (no shuffle on the skewed bucket
  key) and the ADC join keys on `neighbor_id` (~uniform ids), so a
  hot list can never collapse the scan into one task or one shuffle
  partition. The measurement confirms wall time grows ~LINEARLY with
  the corpus — the candidate volume itself — with no cliff.
- Candidate volume is INHERENT: with a degenerate quantizer,
  candidates/probe ≈ 0.95·N at nprobe=1. A max-list-size cap (the
  band-cap analogue) would silently DROP corpus vectors from serving
  — a recall hole, not a skew fix — so the engine instead REPORTS
  degeneracy (`maintenance.check_vector_index`:
  coarse_assignment_degenerate when one list holds > half the corpus)
  and the fix is the standard serving-stack one: retrain the coarse
  quantizer (rebuild), exactly FAISS's reindex guidance.
- update() stays delta-bounded under the adversary (frozen-quantizer
  encode; the hot list is irrelevant to the append).

Usage: python scripts/scaling_vector_adversarial.py [--sf ...]
Prints a markdown table plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 3
N_PROBES = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--factors", default="1,8,64")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lp_etl_plugins_spark import vectorops as V
    from lp_etl_plugins_spark.inventory.vectorops import _emb
    from lp_etl_plugins_spark.session import get_spark

    spark = get_spark(
        "vec-adversarial", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
        or (os.cpu_count() or 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = _emb(spark, args.sf)

    def adversarial(df):
        cloud = df.filter(F.col("vec_id") % 20 != 0).select(
            "vec_id",
            F.lit(0).alias("label"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x * F.lit(0.001) + F.lit(0.5),
            ).alias("embedding"),
        )
        far = df.filter(F.col("vec_id") % 20 == 0).select(
            "vec_id",
            (F.col("vec_id") % 9 + 1).cast("int").alias("label"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x + (F.col("vec_id") % 9 + 1) * F.lit(10.0),
            ).alias("embedding"),
        )
        return cloud.unionByName(far)

    base = adversarial(emb)
    n_base = base.count()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    rows = []
    for factor in [int(x) for x in args.factors.split(",")]:
        copies = [
            base.select(
                (F.col("vec_id") + i * n_base).alias("vec_id"),
                "label",
                F.transform(
                    "embedding", lambda x: x + F.lit(i) * F.lit(1e-6)
                ).alias("embedding"),
            )
            for i in range(factor)
        ]
        corpus = copies[0]
        for c in copies[1:]:
            corpus = corpus.unionByName(c)
        corpus = corpus.localCheckpoint()
        n = corpus.count()

        idx = V.VectorIndex(corpus)
        # force the index, then measure serving only
        mat(idx.corpus_lists)
        mat(idx.codes)
        dist = (
            idx.corpus_lists.groupBy("bucket").count().orderBy(F.desc("count"))
        ).collect()
        max_frac = dist[0]["count"] / n

        probes = corpus.filter(F.col("vec_id") < N_PROBES).select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(1.01)).alias(
                "embedding"
            ),
        )
        t0 = time.time()
        mat(idx.search(probes, K, nprobe=1))
        t_search = time.time() - t0
        # candidates per probe = size of the fanned list(s)
        cand_per_probe = dist[0]["count"]

        # fixed-size delta update under the adversary
        delta = base.filter(F.col("vec_id") < 200).select(
            (F.col("vec_id") + 100_000_000 + n).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(1.001)).alias(
                "embedding"
            ),
        )
        t0 = time.time()
        idx.update(delta)
        mat(idx.corpus_lists)
        t_update = time.time() - t0

        rows.append(
            (factor, n, round(max_frac, 4), cand_per_probe,
             round(t_search, 2), round(t_update, 2))
        )
        print(
            f"# {factor}x: n={n} max_list_frac={max_frac:.3f} "
            f"cand/probe={cand_per_probe} search={t_search:.2f}s "
            f"update={t_update:.2f}s",
            file=sys.stderr,
        )

    print("\n### VectorIndex under a one-hot-list adversary "
          f"({args.sf}, nprobe=1, {N_PROBES} probes)\n")
    print("| factor | corpus | max list frac | candidates/probe | "
          "search s | fixed-delta update s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")
    print()
    print(json.dumps({
        "sf": args.sf,
        "rows": [dict(zip(("factor", "n", "max_list_frac",
                           "cand_per_probe", "search_s", "update_s"), r))
                 for r in rows],
    }))


if __name__ == "__main__":
    main()
