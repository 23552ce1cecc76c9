"""Skewed / adversarial-corpus scaling measurement (VERDICT r7 #3).

Every cap in the engine (the band-size cap in
``textops.pairs_from_band_frame``, the gram df caps in the
decontamination substrate) exists for corpora the benign driver
tables never produce. This script builds a PATHOLOGICAL corpus and
measures the capped paths across 1×/8×/64× inflations, proving the
claims the caps make:

- **30 % near-identical boilerplate** — the same passage plus a
  per-doc unique tail, so EXACT dedup cannot collapse it and the
  near-dup machinery faces one giant similarity group (the group
  grows linearly with the corpus: 0.3·N docs sharing every shingle
  but one);
- **one hot gram** — a shared 10-word tail on EVERY doc, so several
  word-shingles and char-grams have corpus-extent posting lists;
- **a 100×-duplicated doc** — one byte-identical text under 100 ids
  (the exact-dedup group).

Measured paths and what "no blowup" means:

- capped LSH mining (``DedupIndex(max_band_size=64)``, the t10
  machinery): the boilerplate group co-occupies band groups of size
  0.3·N, whose uncapped pair expansion is C(0.3·N, 2) — ~4.6e9 pairs
  at 64× — while the cap bounds per-(band,key) expansion at C(64,2);
  α(time) must stay ~1, and the mined pair count must grow ~linearly,
  not quadratically;
- exact-substring spans (``repeated_substring_spans``, the t37
  machinery): pairs-free by design (gram doc-COUNTS, never doc
  pairs), so the hot gram costs one big count, not a posting-list
  self-join;
- curation pipeline (``CurationState.build(max_band_size=64)`` +
  a FIXED 500-doc benign delta ``update``): build α ~1, update ~flat
  (delta-proportional) even with the skew present in the old corpus.

Usage: python scripts/scaling_adversarial.py [--sf /root/testdata/sf0.1]
Prints a markdown table (paste into SCALE.md) plus one JSON line.
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
CAP = 64
BOILER = (
    "all rights reserved this document is provided as is without "
    "warranty of any kind either express or implied including fitness"
)
HOT_TAIL = (
    "common footer token stream shared across every single document here"
)


def adversarialize(docs, F):
    """Post-inflation pathology injection (see module docstring)."""
    base = docs.select("doc_id", "source", "text")
    boilered = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(F.lit(BOILER + " uniq"), F.col("doc_id").cast("string")),
        ).otherwise(F.col("text")),
    )
    hot = boilered.withColumn("text", F.concat("text", F.lit(" " + HOT_TAIL)))
    hi = hot.agg(F.max("doc_id")).first()[0]
    dup_src = hot.filter(F.col("doc_id") % 10 == 5).limit(1)
    dups = dup_src.crossJoin(
        hot.sparkSession.range(1, 101).select(F.col("id").alias("__k"))
    ).select(
        (F.lit(hi) + F.col("__k")).alias("doc_id"), "source", "text"
    )
    return hot.unionByName(dups)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lp_etl_plugins_spark import scaling
    from lp_etl_plugins_spark import textops as T
    from lp_etl_plugins_spark.incremental import CurationState
    from lp_etl_plugins_spark.session import get_spark
    from lp_etl_plugins_spark.tables import load_table

    spark = get_spark("adversarial", cpus=os.cpu_count() or 8)
    spark.sparkContext.setLogLevel("ERROR")

    raw = load_table(spark, args.sf, "documents")
    base_dir = tempfile.mkdtemp(prefix="adv_")
    dirs: dict[int, str] = {}
    sizes: dict[int, int] = {}
    for f in FACTORS:
        d = os.path.join(base_dir, f"x{f}")
        adv = adversarialize(scaling.inflate_documents(raw, f), F)
        adv.repartition(spark.sparkContext.defaultParallelism).write.mode(
            "overwrite"
        ).parquet(d)
        dirs[f] = d
        sizes[f] = spark.read.parquet(d).count()
        print(f"# built adversarial x{f}: {sizes[f]} docs", file=sys.stderr)

    results: dict[str, dict[int, dict]] = {}

    def record(path_name, f, secs, **extra):
        results.setdefault(path_name, {})[f] = {"s": round(secs, 2), **extra}
        print(f"# {path_name} x{f}: {secs:.1f}s {extra}", file=sys.stderr)

    for f in FACTORS:
        corpus = spark.read.parquet(dirs[f])
        n = sizes[f]
        hot_group = corpus.filter(F.col("doc_id") % 10 < 3).count()

        # capped LSH mining + clusters (t10 machinery)
        t0 = time.perf_counter()
        idx = T.DedupIndex(corpus, "text", "doc_id", max_band_size=CAP)
        n_pairs = idx.pairs.count()
        n_clusters = idx.clusters.select("cluster").distinct().count()
        record(
            "capped_lsh_pairs+clusters", f, time.perf_counter() - t0,
            pairs=n_pairs,
            uncapped_would_be=hot_group * (hot_group - 1) // 2,
        )

        # exact-substring spans (t37 machinery, pairs-free)
        t0 = time.perf_counter()
        n_spans = T.repeated_substring_spans(corpus, "text", "doc_id").count()
        record("exact_substring_spans", f, time.perf_counter() - t0,
               docs_with_spans=n_spans)

        # curation pipeline: capped build + fixed benign delta update
        state_dir = os.path.join(base_dir, f"state_x{f}")
        hi = corpus.agg(F.max("doc_id")).first()[0]
        delta = (
            raw.select("doc_id", "source", "text")
            .filter(F.col("doc_id") < 500)
            .withColumn("doc_id", F.col("doc_id") + F.lit(hi + 1))
        )
        t0 = time.perf_counter()
        st = CurationState.build(spark, corpus, state_dir, max_band_size=CAP)
        t1 = time.perf_counter()
        st.update(delta)
        t2 = time.perf_counter()
        record("curation_build", f, t1 - t0, n_working=int(st.meta["n_working"]))
        record("curation_update_500", f, t2 - t1)
        shutil.rmtree(state_dir, ignore_errors=True)

    print("\n### Adversarial corpus scaling "
          f"(boilerplate 30%, hot gram, 100x dup; cap={CAP})\n")
    print("| path | 1x (s) | 8x (s) | 64x (s) | alpha | notes |")
    print("|---|---|---|---|---|---|")
    out_rows = {}
    for name, r in results.items():
        a = math.log(max(r[64]["s"], 1e-3) / max(r[1]["s"], 1e-3)) / math.log(64)
        notes = ""
        if "pairs" in r[64]:
            notes = (f"pairs {r[1]['pairs']}→{r[64]['pairs']} "
                     f"(uncapped would be {r[64]['uncapped_would_be']:.1e})")
        out_rows[name] = {**{f"x{k}": v["s"] for k, v in r.items()},
                          "alpha": round(a, 2)}
        print(f"| {name} | {r[1]['s']} | {r[8]['s']} | {r[64]['s']} | "
              f"{a:.2f} | {notes} |")
    print()
    print(json.dumps({"cap": CAP, "sizes": sizes, "paths": out_rows,
                      "detail": results}))
    shutil.rmtree(base_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
