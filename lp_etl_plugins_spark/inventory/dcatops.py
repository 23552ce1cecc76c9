"""DCAT extraction-pipeline inventory (SURVEY §3.2) — d* entries.

Each entry exercises one load-bearing shape of the ``dcat`` module over
driver parquet data so DuckDB can hash-check it:

- d1: the grouped-pivot that replaces the reference's N×25 correlated
  scalar queries (DcatAp11ToCkanBatch.java:194-609 → one shuffle)
- d2: keyword sanitize + length guard + sorted list aggregation
  (fixKeyword :75-82, tags :326-331)
- d3: the three-leg diff/merge — matched / new / preserved — including
  J7's preservation leg (:455-463,504-507)
- d4: nested JSON payload assembly with deterministic array ordering
  (:321-509), byte-compared against DuckDB's json builders
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fix_keyword
from ..tables import load_table
from .graphops import _CTE, _graph


def d1_dataset_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-oriented property pivot: customers-as-datasets, one row per
    subject with min-resolved scalar properties — ONE groupBy over the
    bindings instead of per-subject correlated lookups."""
    tr = _graph(spark, sf_dir)
    props = ["urn:name", "urn:segment", "urn:nation", "urn:premium"]
    bindings = tr.filter(
        F.col("s").startswith("urn:customer/") & F.col("p").isin(props)
    )
    return (
        bindings.groupBy("s")
        .pivot("p", props)
        .agg(F.min("o_value"))
        .select(
            "s",
            F.col("urn:name").alias("name"),
            F.col("urn:segment").alias("segment"),
            F.col("urn:nation").alias("nation"),
            F.col("urn:premium").alias("premium"),
        )
    )


D1_SQL = _CTE + """
SELECT s,
  min(CASE WHEN p = 'urn:name' THEN o_value END) AS name,
  min(CASE WHEN p = 'urn:segment' THEN o_value END) AS segment,
  min(CASE WHEN p = 'urn:nation' THEN o_value END) AS nation,
  min(CASE WHEN p = 'urn:premium' THEN o_value END) AS premium
FROM triples
WHERE s LIKE 'urn:customer/%'
  AND p IN ('urn:name', 'urn:segment', 'urn:nation', 'urn:premium')
GROUP BY s
"""


def d2_tag_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword sanitize + length-guard + sorted aggregation: document
    titles become 'tags' per source (fixKeyword + length >= 2 + sorted
    concat, the deterministic variant of the reference's tags loop)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        F.explode(F.split(F.substring("text", 1, 60), r"\s+")).alias("word"),
    )
    tags = words.select("source", fix_keyword(F.col("word")).alias("tag")).filter(
        F.length("tag") >= 2
    )
    return tags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tags"),
        F.countDistinct("tag").alias("n_distinct_tags"),
    )


D2_SQL = """
SELECT source, count(*) AS n_tags, count(DISTINCT tag) AS n_distinct_tags
FROM (
  SELECT source,
         replace(translate(translate(w.word, '/:;', '---'), ',.', ''),
                 '§', 'paragraf') AS tag
  FROM documents, unnest(regexp_split_to_array(substring(text, 1, 60), '\\s+'))
       AS w(word)
) t
WHERE length(tag) >= 2
GROUP BY source
"""


def d3_merge_preserve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-leg diff/merge: incoming (subset of lineitem orderkeys) vs
    existing (subset of orders): matched ids reused, unmatched incoming
    created, unclaimed existing preserved+appended (J7 preservation
    leg). One shuffle join per leg over pre-filtered sides."""
    incoming = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_linenumber") == 1) & (F.col("l_quantity") > 25.0))
        .select(F.col("l_orderkey").alias("key"))
        .distinct()
    )
    existing = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000.0)
        .select(F.col("o_orderkey").alias("key"))
    )
    matched = incoming.join(existing, "key", "inner").select(
        "key", F.lit("matched").alias("origin")
    )
    created = incoming.join(existing, "key", "left_anti").select(
        "key", F.lit("created").alias("origin")
    )
    preserved = existing.join(incoming, "key", "left_anti").select(
        "key", F.lit("preserved").alias("origin")
    )
    return (
        matched.unionByName(created)
        .unionByName(preserved)
        .groupBy("origin")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


D3_SQL = """
WITH incoming AS (
  SELECT DISTINCT l_orderkey AS key FROM lineitem
  WHERE l_linenumber = 1 AND l_quantity > 25.0
),
existing AS (
  SELECT o_orderkey AS key FROM orders WHERE o_totalprice > 150000.0
)
SELECT origin, count(*) AS n_rows FROM (
  SELECT key, 'matched' AS origin FROM incoming WHERE key IN (SELECT key FROM existing)
  UNION ALL
  SELECT key, 'created' FROM incoming WHERE key NOT IN (SELECT key FROM existing)
  UNION ALL
  SELECT key, 'preserved' FROM existing WHERE key NOT IN (SELECT key FROM incoming)
) t GROUP BY origin
"""


def d4_payload_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested JSON payload: one object per region with a sorted nested
    array of nation objects — to_json(struct) byte-compared against
    DuckDB's json builders (field order and compact encoding align)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = nation.join(region, nation.n_regionkey == region.r_regionkey)
    grouped = joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.array_sort(
            F.collect_list(F.struct(F.col("n_name").alias("name")))
        ).alias("nations"),
    )
    return grouped.select(
        "r_name",
        F.to_json(
            F.struct(
                F.col("r_name").alias("region"),
                F.col("n_nations").alias("n_nations"),
                F.col("nations").alias("nations"),
            )
        ).alias("payload"),
    )


D4_SQL = """
SELECT r_name,
  '{"region":"' || r_name || '","n_nations":' || count(*) || ',"nations":['
    || string_agg(json_object('name', n_name)::VARCHAR, ',' ORDER BY n_name)
    || ']}' AS payload
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


QUERIES = {
    "d1_dataset_pivot": d1_dataset_pivot,
    "d2_tag_sanitize": d2_tag_sanitize,
    "d3_merge_preserve": d3_merge_preserve,
    "d4_payload_json": d4_payload_json,
}

ORACLES = {
    "d1_dataset_pivot": D1_SQL,
    "d2_tag_sanitize": D2_SQL,
    "d3_merge_preserve": D3_SQL,
    "d4_payload_json": D4_SQL,
}
