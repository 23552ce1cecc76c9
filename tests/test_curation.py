"""Golden test for the end-to-end curation pipeline (VERDICT r4 #3).

Runs the full registry-composed spec at sf0.001 and checks the output
corpus AND the per-stage Observation metrics against independently
computed expectations.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from conftest import SF_SMOKE

from lp_etl_plugins_spark import curation, registry
from lp_etl_plugins_spark import textops as T
from lp_etl_plugins_spark.tables import load_table


def test_components_registered():
    comps = registry.components()
    for name in (
        "corpus_ingest",
        "lang_filter",
        "quality_filter",
        "exact_dedup_keep_first",
        "near_dedup_canonical",
        "decontaminate_corpus",
        "quota_mix",
        "write_corpus",
        # the §2.8 builtins still present alongside
        "fdp_to_cube",
        "dcat_to_ckan",
    ):
        assert name in comps, name


def test_curate_corpus_end_to_end(spark, tmp_path):
    out = str(tmp_path / "curated")
    result = curation.curate_corpus(spark, SF_SMOKE, out, quota_k=50)
    m = result["metrics"]
    # every stage reported, pipeline is monotonically non-increasing
    order = [
        "corpus_ingest",
        "lang_filter",
        "quality_filter",
        "exact_dedup_keep_first",
        "near_dedup_canonical",
        "decontaminate_corpus",
        "quota_mix",
    ]
    assert list(m) == order
    for a, b in zip(order, order[1:]):
        assert m[b] <= m[a], (a, b, m)
    assert m["corpus_ingest"] == load_table(spark, SF_SMOKE, "documents").count()
    assert m["quota_mix"] > 0

    # output is source-partitioned parquet with the final row count
    final = spark.read.parquet(out)
    assert final.count() == m["quota_mix"]
    # partition pruning works (source is a hive partition column)
    srcs = [r["source"] for r in final.select("source").distinct().collect()]
    assert "src0" not in srcs  # benchmark source never ships
    assert len(srcs) >= 2
    plan = final.filter(F.col("source") == srcs[0])._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan

    # stage semantics vs independent recomputation
    docs = load_table(spark, SF_SMOKE, "documents")
    n_lang = docs.filter(T.lang_id("text") == "en").count()
    assert m["lang_filter"] == n_lang
    # quota respected per source
    per_src = final.groupBy("source").count().collect()
    assert all(r["count"] <= 50 for r in per_src)
    # the curated corpus has no exact duplicates
    assert final.select(F.md5("text")).distinct().count() == final.count()


def test_curate_corpus_without_quota(spark, tmp_path):
    out = str(tmp_path / "curated_full")
    result = curation.curate_corpus(spark, SF_SMOKE, out)
    assert "quota_mix" not in result["metrics"]
    n = spark.read.parquet(out).count()
    assert n == result["metrics"]["decontaminate_corpus"]


def test_curate_corpus_lm_quality_gate(spark, tmp_path):
    """min_doc_lp inserts the trigram-LM statistical gate: a permissive
    threshold keeps the corpus intact; a prohibitive one removes
    everything and the reload stage reports the empty corpus with a
    clear error instead of Spark's schema-inference failure."""
    import pytest

    out = str(tmp_path / "curated_lm")
    res = curation.curate_corpus(spark, SF_SMOKE, out, min_doc_lp=-99.0)
    m = res["metrics"]
    assert m["lm_quality_filter"] == m["quality_filter"]  # permissive: no-op

    strict_out = str(tmp_path / "curated_lm_strict")
    with pytest.raises(ValueError, match="no rows were written"):
        curation.curate_corpus(
            spark, SF_SMOKE, strict_out, min_doc_lp=0.0, pack_capacity=512
        )


def test_curate_corpus_redact_and_pack(spark, tmp_path):
    """redact=True scrubs denylisted terms BEFORE dedup; pack_capacity
    writes a second parquet with the context-window assignment whose
    layout obeys the concat-split invariant within every shard."""
    out = str(tmp_path / "curated_rp")
    result = curation.curate_corpus(
        spark, SF_SMOKE, out, redact=True, pack_capacity=512
    )
    m = result["metrics"]
    assert "redact_corpus" in m and "pack_corpus" in m
    # redaction rewrites text, never drops rows
    assert m["redact_corpus"] == m["quality_filter"]

    final = spark.read.parquet(out)
    # no denylisted term survives in the curated text
    assert final.filter(F.col("text").rlike(r"\b(customer|supplier)\b")).count() == 0
    assert final.filter(F.col("text").contains("<ENTITY>")).count() > 0

    packed = spark.read.parquet(result["packed_path"])
    assert packed.count() == m["pack_corpus"] == final.count()
    # layout invariant: within (source, shard), offsets are the running
    # token sum in doc_id order and bin = start // capacity
    rows = sorted(
        packed.collect(), key=lambda r: (r["source"], r["shard"], r["doc_id"])
    )
    run: dict = {}
    for r in rows:
        key = (r["source"], r["shard"])
        expect = run.get(key, 0)
        assert r["start_offset"] == expect, r
        assert r["bin"] == expect // 512
        run[key] = expect + r["toks"]


def test_trim_repeated_spans_keeps_owner_copy(spark):
    """The exact-substring scrub: the minimal-id owner of a repeated
    passage keeps its text verbatim, every later carrier loses exactly
    the shared words, and documents without cross-doc repeats pass
    through byte-identical."""
    from lp_etl_plugins_spark import textops as T

    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, "src1", f"alpha opening words {shared} alpha closing words"),
        (2, "src2", f"beta begins here {shared} beta ends here"),
        (3, "src3", "gamma has entirely original content with no repeats at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["text"] for r in T.trim_repeated_spans(
        docs, "text", "doc_id"
    ).collect()}
    assert out[1] == rows[0][2]  # owner untouched
    assert out[3] == rows[2][2]  # no-repeat doc untouched
    assert out[2] == "beta begins here beta ends here"  # shared span cut
    # idempotent: a second pass finds nothing left to trim
    docs2 = spark.createDataFrame(
        [(k, "s", v) for k, v in out.items()], "doc_id long, source string, text string"
    )
    out2 = {r["doc_id"]: r["text"] for r in T.trim_repeated_spans(
        docs2, "text", "doc_id"
    ).collect()}
    assert out2 == out


def test_curate_corpus_scrub_repeats_stage(spark, tmp_path):
    """scrub_repeat_spans=True inserts the exact-substring scrub
    between exact and near dedup: the stage metric is recorded, row
    count is preserved (it rewrites, never drops), and the stage order
    in the metrics dict matches the declared pipeline."""
    out = str(tmp_path / "curated_scrub")
    result = curation.curate_corpus(spark, SF_SMOKE, out, scrub_repeat_spans=True)
    m = result["metrics"]
    assert "scrub_repeats" in m
    assert m["scrub_repeats"] == m["exact_dedup_keep_first"]
    keys = list(m)
    assert keys.index("exact_dedup_keep_first") < keys.index("scrub_repeats") < keys.index(
        "near_dedup_canonical"
    )
