"""End-to-end corpus-curation pipeline through the component registry.

The LP-ETL analog: the reference wires components into pipelines via
ports (``t-fdpToRdf/src/main/resources/LP-ETL/template/definition.jsonld:12-56``);
the engine's equivalent is :mod:`registry` stages composed by
:func:`registry.pipeline`. This module registers the corpus-curation
stages a large-scale training-data pipeline runs — ingest → language
ID → rule quality filter → optional trigram-LM quality gate → optional
PII/denylist redaction → exact dedup → near-dup canonicalization (via
the build-once :class:`textops.DedupIndex`) → benchmark decontamination
→ quota mix → partitioned parquet → optional context-window
sequence-packing manifests — and a one-call composition,
:func:`curate_corpus`.

Every stage attaches a Spark ``Observation`` (the engine's A6 progress
counter, ``util.observe_rows``): per-stage row counts materialize with
the single write action at the end — progress metrics without a second
pass over the data.

Scale notes: the stages compose into ONE logical plan per substrate —
filters fuse into the scan, the dedup window is hash-partitioned by
content, the near-dup index builds once (checkpointed) and its cluster
map joins back broadcast-sized, and the final write is hive-partitioned
by source for downstream partition pruning. Nothing collects to the
driver except the observation scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import textops as T
from .registry import register
from .tables import load_table
from .util import observe_rows, write_partitioned

__all__ = ["curate_corpus"]


def _observed(df: DataFrame, stage: str) -> dict:
    df, obs = observe_rows(df, f"{stage}_rows")
    return {"corpus": df, "observation": obs}


@register(
    "corpus_ingest",
    "Load the documents corpus from a parquet dir, spread across cores",
    ("sf_dir",),
    ("corpus", "observation"),
)
def corpus_ingest(spark: SparkSession, sf_dir: str) -> dict:
    par = spark.sparkContext.defaultParallelism
    return _observed(
        load_table(spark, sf_dir, "documents").repartition(par), "ingest"
    )


@register(
    "lang_filter",
    "Keep documents whose stopword language ID matches",
    ("corpus", "lang"),
    ("corpus", "observation"),
)
def lang_filter(spark: SparkSession, corpus: DataFrame, lang: str = "en") -> dict:
    return _observed(corpus.filter(T.lang_id("text") == lang), "lang")


@register(
    "quality_filter",
    "Keep documents at/above a quality-score threshold",
    ("corpus", "min_quality"),
    ("corpus", "observation"),
)
def quality_filter(
    spark: SparkSession, corpus: DataFrame, min_quality: float = 0.5
) -> dict:
    return _observed(
        corpus.filter(T.quality_score("text") >= min_quality), "quality"
    )


@register(
    "exact_dedup_keep_first",
    "Collapse byte-identical texts, keeping the smallest doc_id",
    ("corpus",),
    ("corpus", "observation"),
)
def exact_dedup_keep_first(spark: SparkSession, corpus: DataFrame) -> dict:
    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        corpus.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return _observed(kept, "exact_dedup")


@register(
    "scrub_repeats",
    "Trim cross-document repeated passages, keeping the minimal-id owner's copy",
    ("corpus", "span_n"),
    ("corpus", "observation"),
)
def scrub_repeats(
    spark: SparkSession, corpus: DataFrame, span_n: int = 8
) -> dict:
    """Exact-substring dedup as a pipeline stage (the transform half
    of t37): boilerplate passages shared across documents survive
    exact AND near dedup (the carrying docs differ elsewhere), so they
    are cut here — every repeated run of ≥ ``span_n`` words is kept
    only in its minimal-id owner. Runs after exact dedup (owners are
    canonical) and before near-dedup (trimmed text is what similarity
    should judge). Trimmed documents are rebuilt from normalized
    words; untouched documents pass through byte-identical."""
    return _observed(
        T.trim_repeated_spans(corpus, "text", "doc_id", span_n), "scrub_repeats"
    )


@register(
    "near_dedup_canonical",
    "Collapse near-dup clusters (build-once LSH index) to their best-quality member",
    ("corpus",),
    ("corpus", "observation"),
)
def near_dedup_canonical(spark: SparkSession, corpus: DataFrame) -> dict:
    from pyspark.sql import Window as W

    # a fresh index over THIS (already filtered) corpus — the inventory
    # cache is keyed by raw corpus dir and must not serve filtered data.
    # Deletion decisions collapse VERIFIED clusters only: candidate
    # components include LSH band false positives (collision prob
    # ≈ s^rows per band), and deleting on those would drop documents
    # that are not near-duplicates under the configured threshold.
    idx = T.DedupIndex(corpus, "text", "doc_id")
    labeled = (
        corpus.withColumn("__q", T.quality_score("text"))
        .join(idx.verified_clusters.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .withColumn("cluster", F.coalesce("cluster", "doc_id"))
    )
    w = W.partitionBy("cluster").orderBy(F.col("__q").desc(), F.col("doc_id").asc())
    kept = (
        labeled.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__q", "cluster")
    )
    return _observed(kept, "near_dedup")


@register(
    "lm_quality_filter",
    "Keep documents at/above a trigram-LM log-probability threshold",
    ("corpus", "min_doc_lp"),
    ("corpus", "observation"),
)
def lm_quality_filter(
    spark: SparkSession, corpus: DataFrame, min_doc_lp: float = -11.0
) -> dict:
    """Statistical quality gate (the CCNet-style LM filter, beyond the
    rule-based :func:`quality_filter`): train a :class:`textops.TrigramLM`
    on THIS corpus and keep documents whose mean log2 trigram
    probability clears ``min_doc_lp`` — mojibake, binary spill, and
    wrong-language fragments score far below natural text. One count
    groupBy to train (the model is vocab-sized), one join + per-doc
    aggregate to score, a semi-join back to keep full rows; docs too
    short to produce a gram have no score and are dropped (nothing to
    attest quality). The threshold is an absolute log-prob — corpus-
    independent and deterministic, unlike a quantile cut (which needs
    a global rank)."""
    # checkpoint=False: the corpus carries upstream observe nodes;
    # TrigramLM's internal lazy checkpoints would truncate that plan at
    # call time and detach the per-stage metrics
    lm = T.TrigramLM(corpus, "text", "doc_id", checkpoint=False)
    # EAGER checkpoint on the kept-id set: (a) the score aggregation
    # runs once instead of once per downstream action, and (b) without
    # it the observed corpus subtree appears on BOTH sides of the
    # semi-join and Spark's relation dedup breaks the upstream
    # Observation attribution (metrics read 0)
    keep = (
        lm.score()
        .filter(F.col("doc_lp") >= min_doc_lp)
        .select(F.col("id").alias("doc_id"))
        .localCheckpoint()
    )
    return _observed(corpus.join(keep, "doc_id", "left_semi"), "lm_quality")


@register(
    "redact_corpus",
    "Scrub emails, URLs, and denylisted entity terms from document text",
    ("corpus", "denylist"),
    ("corpus", "observation"),
)
def redact_corpus(
    spark: SparkSession,
    corpus: DataFrame,
    denylist: tuple[str, ...] = ("customer", "supplier"),
) -> dict:
    rules = [(T.EMAIL_PATTERN, "<EMAIL>"), (T.URL_PATTERN, "<URL>")]
    if denylist:
        rules.append((T.denylist_pattern(denylist), "<ENTITY>"))
    return _observed(
        corpus.withColumn("text", T.redact_text("text", rules)), "redact"
    )


@register(
    "pack_corpus",
    "Pack the curated corpus into fixed-capacity context-window bins",
    ("corpus", "capacity"),
    ("packed", "observation"),
)
def pack_corpus(
    spark: SparkSession,
    corpus: DataFrame,
    capacity: int = 2048,
    n_shards: int = 64,
) -> dict:
    """Final layout step: every document gets its (shard, bin,
    start_offset) under the concat-and-split packing of
    :func:`textops.pack_bins` — sharded, so the sequential prefix sum
    parallelizes per (source, shard). Emits the ASSIGNMENT frame
    (joinable back to the corpus on doc_id), not the corpus itself."""
    packed = T.pack_bins(
        corpus, "text", "doc_id", "source", capacity, n_shards
    ).withColumnRenamed("id", "doc_id")
    packed, obs = observe_rows(packed, "pack_rows")
    return {"packed": packed, "observation": obs}


@register(
    "decontaminate_corpus",
    "Drop benchmark docs and training docs that leak a benchmark",
    ("corpus", "bench_source"),
    ("corpus", "observation"),
)
def decontaminate_corpus(
    spark: SparkSession, corpus: DataFrame, bench_source: str = "src0"
) -> dict:
    flagged = corpus.withColumn("__bench", F.col("source") == bench_source)
    contaminated = T.decontaminate(flagged, "text", "doc_id", "__bench")
    kept = (
        flagged.filter(~F.col("__bench"))
        .join(contaminated, "doc_id", "left_anti")
        .drop("__bench")
    )
    return _observed(kept, "decontaminate")


@register(
    "quota_mix",
    "Deterministic per-source quota sample (stratified data mixing)",
    ("corpus", "k"),
    ("corpus", "observation"),
)
def quota_mix(spark: SparkSession, corpus: DataFrame, k: int) -> dict:
    return _observed(
        T.quota_sample(corpus, "source", "doc_id", k).drop("sample_rank"), "mix"
    )


@register(
    "write_corpus",
    "Write the curated corpus as source-partitioned parquet",
    ("corpus", "path"),
    ("path",),
)
def write_corpus(spark: SparkSession, corpus: DataFrame, path: str) -> dict:
    write_partitioned(corpus, path, ["source"])
    return {"path": path}


@register(
    "corpus_reload",
    "Re-open a written corpus so downstream stages read parquet instead of re-running the upstream plan",
    ("path",),
    ("corpus",),
)
def corpus_reload(spark: SparkSession, path: str) -> dict:
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        return {"corpus": spark.read.parquet(path)}
    except AnalysisException as exc:
        if "UNABLE_TO_INFER_SCHEMA" in str(exc):
            # an all-filtered corpus writes a schemaless empty dir; the
            # raw Spark error ("unable to infer schema") hides the
            # actual problem from the pipeline operator
            raise ValueError(
                f"corpus_reload: no rows were written to {path!r} — every "
                "document was removed by the upstream filter/dedup stages; "
                "relax the lang/quality thresholds or check the input corpus"
            ) from exc
        raise


@register(
    "write_packed",
    "Write the context-window packing assignment as source-partitioned parquet",
    ("packed", "path"),
    ("packed_path",),
)
def write_packed(spark: SparkSession, packed: DataFrame, path: str) -> dict:
    write_partitioned(packed, path, ["source"])
    return {"packed_path": path}


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    lang: str = "en",
    min_quality: float = 0.5,
    bench_source: str = "src0",
    quota_k: int | None = None,
    redact: bool = False,
    pack_capacity: int | None = None,
    min_doc_lp: float | None = None,
    scrub_repeat_spans: bool = False,
) -> dict:
    """Run the full curation pipeline via the registry and return
    ``{"path": out_path, "metrics": {stage: rows_out}}``. The metrics
    come from the per-stage Observations, all materialized by the one
    write action (no second pass). ``redact=True`` inserts the
    PII/denylist scrub after the quality filter (before dedup, so
    redacted forms are what dedup compares); ``min_doc_lp`` adds the
    trigram-LM statistical quality gate after the rule-based filter;
    ``scrub_repeat_spans=True`` inserts the exact-substring scrub
    (:func:`scrub_repeats`) between exact and near dedup;
    ``pack_capacity`` adds the context-window packing assignment as a
    second parquet output at ``{out_path}_packed`` and a
    ``"packed_path"`` result key."""
    from . import registry

    stages: list[tuple[str, dict]] = [
        ("corpus_ingest", {"sf_dir": sf_dir}),
        ("lang_filter", {"corpus": "$corpus", "lang": lang}),
        ("quality_filter", {"corpus": "$corpus", "min_quality": min_quality}),
    ]
    if min_doc_lp is not None:
        stages.append(("lm_quality_filter", {"corpus": "$corpus", "min_doc_lp": min_doc_lp}))
    if redact:
        stages.append(("redact_corpus", {"corpus": "$corpus"}))
    stages.append(("exact_dedup_keep_first", {"corpus": "$corpus"}))
    if scrub_repeat_spans:
        stages.append(("scrub_repeats", {"corpus": "$corpus", "span_n": 8}))
    stages += [
        ("near_dedup_canonical", {"corpus": "$corpus"}),
        ("decontaminate_corpus", {"corpus": "$corpus", "bench_source": bench_source}),
    ]
    if quota_k is not None:
        stages.append(("quota_mix", {"corpus": "$corpus", "k": quota_k}))
    stages.append(("write_corpus", {"corpus": "$corpus", "path": out_path}))
    if pack_capacity is not None:
        # pack from the parquet just written, not the live logical plan:
        # re-deriving the curated corpus would re-run every upstream
        # stage (lang-ID scans, dedup windows, decontamination joins)
        # for the second write action
        stages.append(("corpus_reload", {"path": "$path"}))
        stages.append(("pack_corpus", {"corpus": "$corpus", "capacity": pack_capacity}))
        stages.append(("write_packed", {"packed": "$packed", "path": out_path + "_packed"}))
    ctx = registry.pipeline(spark, stages)
    metrics: dict[str, int] = {}
    for name, _ in stages:
        obs = ctx.get(f"{name}.observation")
        if obs is not None:
            metrics[name] = int(obs.get["rows"])
    out = {"path": out_path, "metrics": metrics}
    if pack_capacity is not None:
        out["packed_path"] = out_path + "_packed"
    return out
