"""Retraction scaling measurement (late round 9).

The retraction family's 100 TB claim is that deletion cost is bounded
by the DELETION, not the corpus: tombstone filters are O(delta)
appends + broadcast anti-joins, the LM subtraction is one
delta-sized explode + a vocab-sized merge, and the cluster relabel is
bounded by the affected clusters' surviving edges. This script holds
the deletion set FIXED (the same ~200 base-replica ids) while the
corpus inflates 1×/8×/64× (`scaling.inflate_documents` /
`inflate_embeddings` — replicas are perturbed, so they are not
near-dups of each other), builds each family's PERSISTED index, and
times `retract` + `retract_saved` (RepeatIndex's retract is the whole
fenced op). α = log(t_64/t_1)/log(64): ~0 means corpus-independent,
1 means linear — the rebuild alternative every deletion request would
otherwise pay.

Usage: python scripts/scaling_retraction.py [--sf /root/testdata/sf0.1]
Prints a markdown table (paste into SCALE.md) plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTORS = (1, 8, 64)
N_RETRACT = 200  # fixed deletion set (base-replica ids)


ALL_FAMILIES = ("dedup", "repeat", "trigram", "vector", "media", "curation")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--families",
        default=",".join(ALL_FAMILIES),
        help="comma list from: " + ",".join(ALL_FAMILIES),
    )
    args = ap.parse_args()
    fams = tuple(args.families.split(","))

    from pyspark.sql import functions as F

    from lp_etl_plugins_spark import scaling
    from lp_etl_plugins_spark.incremental import CurationState
    from lp_etl_plugins_spark.multimodal import MediaIndex, synthetic_media
    from lp_etl_plugins_spark.session import get_spark
    from lp_etl_plugins_spark.tables import load_table
    from lp_etl_plugins_spark.textops import DedupIndex, RepeatIndex, TrigramLM
    from lp_etl_plugins_spark.vectorops import VectorIndex

    spark = get_spark("scaling-retraction", cpus=os.cpu_count() or 8)
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="scaling_retract_")

    docs0 = load_table(spark, args.sf, "documents")
    emb0 = load_table(spark, args.sf, "embeddings")
    results: dict[str, dict[int, dict]] = {}

    def rec(family: str, f: int, **kw) -> None:
        results.setdefault(family, {})[f] = {
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in kw.items()
        }
        print(f"# {family} x{f}: {results[family][f]}", file=sys.stderr)

    for f in FACTORS:
        docs = scaling.inflate_documents(docs0, f).select(
            "doc_id", "text"
        )
        dpath = os.path.join(base, f"docs_x{f}.parquet")
        docs.write.mode("overwrite").parquet(dpath)
        docs = spark.read.parquet(dpath)
        n_docs = docs.count()
        # the SAME ~N_RETRACT logical documents at every factor: the
        # replica-0 copies of ids 0..N_RETRACT-1 keep their original
        # ids under inflate_documents' id scheme (id*factor), so pick
        # every factor-th id below N_RETRACT*factor
        r_pred = (F.col("doc_id") % f == 0) & (
            F.col("doc_id") < N_RETRACT * f
        )
        r_ids = docs.filter(r_pred).select(
            F.col("doc_id").alias("id")
        ).localCheckpoint()
        n_r = r_ids.count()
        keep = docs.filter(~r_pred)

        # --- DedupIndex
        if "dedup" in fams:
            p = os.path.join(base, f"dedup_x{f}")
            t0 = time.perf_counter()
            DedupIndex(docs, "text", "doc_id").save(p)
            build_s = time.perf_counter() - t0
            idx = DedupIndex.load(spark, p)
            t0 = time.perf_counter()
            idx.retract(r_ids)
            idx.retract_saved(p)
            rec("dedup", f, n_docs=n_docs, n_retract=n_r,
                build_s=build_s, retract_s=time.perf_counter() - t0)

        # --- RepeatIndex. Round 10: retract is timed AFTER compact —
        # the g-sorted postings layout + resolved gram_counts the
        # locate fast path prunes against land on the maintenance
        # cadence (that IS the deployment shape: nightly compact,
        # takedowns against the compacted index) — and as min-of-2 on
        # fresh copies (retract mutates, so trials need their own
        # directory; this family's number is the contested scan-bound
        # one, so it gets the noise discipline).
        if "repeat" in fams:
            import shutil

            p = os.path.join(base, f"repeat_x{f}")
            t0 = time.perf_counter()
            RepeatIndex.build(spark, docs, p, "text", "doc_id")
            build_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            RepeatIndex.load(spark, p).compact()
            compact_s = time.perf_counter() - t0
            trials = []
            for t in range(2):
                pt = os.path.join(base, f"repeat_x{f}_t{t}")
                shutil.copytree(p, pt)
                idx = RepeatIndex.load(spark, pt)
                t0 = time.perf_counter()
                m = idx.retract(r_ids, old_docs=keep)
                trials.append(time.perf_counter() - t0)
                shutil.rmtree(pt, ignore_errors=True)
            rec("repeat", f, n_docs=n_docs, n_retract=n_r, build_s=build_s,
                compact_s=compact_s, retract_s=min(trials),
                retract_trials=[round(x, 2) for x in trials],
                touched_old=m["touched_old"])

        # --- TrigramLM (needs the retracted docs' texts)
        if "trigram" in fams:
            p = os.path.join(base, f"lm_x{f}")
            t0 = time.perf_counter()
            TrigramLM(docs, "text", "doc_id").save(p)
            build_s = time.perf_counter() - t0
            lm = TrigramLM.load(spark, p)
            r_docs = docs.filter(r_pred).localCheckpoint()
            t0 = time.perf_counter()
            lm.retract(r_docs)
            lm.retract_saved(p)
            rec("trigram", f, n_docs=n_docs, n_retract=n_r,
                build_s=build_s, retract_s=time.perf_counter() - t0)

        # --- VectorIndex
        if "vector" in fams:
            emb = scaling.inflate_embeddings(emb0, f)
            epath = os.path.join(base, f"emb_x{f}.parquet")
            emb.write.mode("overwrite").parquet(epath)
            emb = spark.read.parquet(epath)
            ev_pred = (F.col("vec_id") % f == 0) & (
                F.col("vec_id") < N_RETRACT * f
            )
            ev_ids = emb.filter(ev_pred).select(
                F.col("vec_id").alias("id")
            ).localCheckpoint()
            p = os.path.join(base, f"vec_x{f}")
            t0 = time.perf_counter()
            VectorIndex(emb).save(p)
            build_s = time.perf_counter() - t0
            vidx = VectorIndex.load(spark, p)
            t0 = time.perf_counter()
            vidx.retract(ev_ids)
            vidx.retract_saved(p)
            rec("vector", f, n_docs=emb.count(), n_retract=ev_ids.count(),
                build_s=build_s, retract_s=time.perf_counter() - t0)

        # --- MediaIndex (the synthetic corpus scales by item count)
        if "media" in fams:
            media = synthetic_media(spark, 200 * f)
            m_ids = media.filter(
                (F.col("media_id") % f == 0)
                & (F.col("media_id") < N_RETRACT * f // 4)
            ).select(F.col("media_id").alias("id")).localCheckpoint()
            p = os.path.join(base, f"media_x{f}")
            t0 = time.perf_counter()
            MediaIndex(media).save(p)
            build_s = time.perf_counter() - t0
            midx = MediaIndex.load(spark, p)
            t0 = time.perf_counter()
            midx.retract(m_ids)
            midx.retract_saved(p)
            rec("media", f, n_docs=200 * f, n_retract=m_ids.count(),
                build_s=build_s, retract_s=time.perf_counter() - t0)

        # --- CurationState (round 10: pipeline-level blast radius —
        # the takedown path through EVERY substrate: root ledger,
        # embedded index retraction + affected-cluster relabel,
        # canonical re-election, tombstones, incremental decontam)
        if "curation" in fams:
            cdocs = docs.withColumn("source", F.lit("src1"))
            # keep a bench source so the contamination leg is live
            cdocs = cdocs.withColumn(
                "source",
                F.when(F.col("doc_id") % 11 == 0, F.lit("src0")).otherwise(
                    F.col("source")
                ),
            )
            p = os.path.join(base, f"curation_x{f}")
            t0 = time.perf_counter()
            # inflate_documents' per-replica word tags defeat the
            # n-gram lang-ID (uniformly 'unknown' at every factor) —
            # gate on that label so the corpus composition stays
            # factor-stable instead of filtering to empty
            CurationState.build(spark, cdocs, p, lang="unknown")
            build_s = time.perf_counter() - t0
            st = CurationState.load(spark, p)
            t0 = time.perf_counter()
            mres = st.retract(r_ids.withColumnRenamed("id", "doc_id"))
            rec("curation", f, n_docs=n_docs, n_retract=n_r,
                build_s=build_s, retract_s=time.perf_counter() - t0,
                working_retracts=mres["working_retracts"],
                working_adds=mres["working_adds"])

    def alpha(family: str) -> float:
        t1 = results[family][FACTORS[0]]["retract_s"]
        t64 = results[family][FACTORS[-1]]["retract_s"]
        return round(math.log(max(t64, 1e-9) / max(t1, 1e-9))
                     / math.log(FACTORS[-1] / FACTORS[0]), 2)

    print("\n| family | corpus x1 → x64 | build x1 → x64 s | "
          "retract (fixed delta) x1 → x64 s | α(retract) |")
    print("|---|---|---|---|---|")
    for fam in [x for x in ALL_FAMILIES if x in results]:
        r1, r64 = results[fam][1], results[fam][64]
        print(f"| {fam} | {r1['n_docs']:,} → {r64['n_docs']:,} "
              f"| {r1['build_s']} → {r64['build_s']} "
              f"| {r1['retract_s']} → {r64['retract_s']} "
              f"| {alpha(fam)} |")
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
