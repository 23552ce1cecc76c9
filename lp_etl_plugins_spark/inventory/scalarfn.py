"""Scalar-function inventory (SURVEY §2.6 F1–F14, §2.2 P6–P11).

Each query drives an engine function from ``lp_etl_plugins_spark.functions``
over the test tables and has an exact DuckDB twin. Where Java-regex and
RE2 replacement syntax differ (``$1`` vs ``\\1``) the two sides are written
in their native dialect with identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import classify_date_shape
from ..functions.numeric import money_round, parse_localized_number
from ..functions.rdf import format_ntriple
from ..functions.text import fix_keyword, iri_encode, slugify
from ..tables import load_table, wall_timestamp


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- F1/P6 — keyword sanitize + length guard (DcatAp11ToCkanBatch.java:75-82,326-331)


def f1_keyword_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    dirty = F.concat(F.col("p_name"), F.lit(",v1./tag:x;y§z"))
    return (
        part.select("p_partkey", fix_keyword(dirty).alias("keyword"))
        .filter(F.length("keyword") >= 2)
    )


F1_SQL = """
SELECT p_partkey,
       replace(translate(p_name || ',v1./tag:x;y§z', '/:;,.', '---'), '§', 'paragraf') AS keyword
FROM part
WHERE length(replace(translate(p_name || ',v1./tag:x;y§z', '/:;,.', '---'), '§', 'paragraf')) >= 2
"""


# --- F2/P9 — regex extract/rewrite (mimetype + RÚIAN shapes,
#     DcatAp11ToCkanBatch.java:497; DcatAp11ToDkanBatch.java:378-406)


def f2_regex_extract_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds RÚIAN-style IRIs then parses type/code back out by regex
    and rewrites a mimetype-ish string, mirroring both reference regex uses."""
    cust = _t(spark, sf_dir, "customer")
    iri = F.concat(
        F.lit("http://ruian.linked.opendata.cz/resource/"),
        F.lower(F.col("c_mktsegment")),
        F.lit("/"),
        F.col("c_custkey").cast("string"),
    )
    mime = F.concat(F.lit("http://www.iana.org/assignments/media-types/text/"), F.lower(F.col("c_mktsegment")))
    return cust.select(
        "c_custkey",
        F.regexp_extract(iri, r"resource/([^/]+)/(.*)", 1).alias("ruian_type"),
        F.regexp_extract(iri, r"resource/([^/]+)/(.*)", 2).alias("ruian_code"),
        F.regexp_replace(mime, r".*/([^/]+/[^/]+)", "$1").alias("mimetype"),
    )


F2_SQL = """
SELECT
  c_custkey,
  regexp_extract('http://ruian.linked.opendata.cz/resource/' || lower(c_mktsegment) || '/' || CAST(c_custkey AS VARCHAR),
                 'resource/([^/]+)/(.*)', 1) AS ruian_type,
  regexp_extract('http://ruian.linked.opendata.cz/resource/' || lower(c_mktsegment) || '/' || CAST(c_custkey AS VARCHAR),
                 'resource/([^/]+)/(.*)', 2) AS ruian_code,
  regexp_replace('http://www.iana.org/assignments/media-types/text/' || lower(c_mktsegment),
                 '.*/([^/]+/[^/]+)', '\\1') AS mimetype
FROM customer
"""


# --- F3/P11 — date-shape regex classification (DateDimension.java:64-81)


def p11_date_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesizes the four reference date shapes (plus one invalid) from
    o_orderdate and classifies them back through the regex cascade."""
    orders = _t(spark, sf_dir, "orders")
    shape_pick = F.col("o_orderkey") % 5
    # date_format on an LTZ column renders through the session zone;
    # the wall-time view keeps the synthesized shapes tz-independent
    wd = wall_timestamp(orders, "o_orderdate")
    raw = (
        F.when(shape_pick == 0, F.date_format(wd, "yyyy-MM-dd"))
        .when(shape_pick == 1, F.date_format(wd, "yyyy-MM"))
        .when(shape_pick == 2, F.date_format(wd, "yyyy"))
        .when(shape_pick == 3, F.date_format(wd, "yyyy-MM-dd'T'HH:mm:ss"))
        .otherwise(F.lit("not-a-date"))
    )
    return (
        orders.select(classify_date_shape(raw).alias("date_shape"))
        .groupBy("date_shape")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


P11_SQL = """
WITH raw AS (
  SELECT CASE o_orderkey % 5
    WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
    WHEN 1 THEN strftime(o_orderdate, '%Y-%m')
    WHEN 2 THEN strftime(o_orderdate, '%Y')
    WHEN 3 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
    ELSE 'not-a-date' END AS v
  FROM orders
)
SELECT CASE
    WHEN regexp_matches(v, '^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}$') THEN 'interval'
    WHEN regexp_matches(v, '^\\d{4}-\\d{2}-\\d{2}$') THEN 'day'
    WHEN regexp_matches(v, '^\\d{4}-\\d{2}$') THEN 'month'
    WHEN regexp_matches(v, '^\\d{4}$') THEN 'year'
  END AS date_shape,
  count(*) AS n_rows
FROM raw GROUP BY 1
"""


# --- P7/F4 — NFD slugify (the engine's one pandas UDF,
#     DcatAp11ToCkanBatch.java:273-277)


def p7_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    diacritic = F.concat(F.col("c_name"), F.lit(" Žluťoučká. Org č"))
    return cust.select("c_custkey", slugify(diacritic).alias("slug"))


P7_SQL = """
SELECT c_custkey,
       lower(replace(replace(strip_accents(c_name || ' Žluťoučká. Org č'), ' ', '-'), '.', '-')) AS slug
FROM customer
"""


# --- P8/F7 — URL-encoded IRI keys (FdpDimension.java:106-115)


def p8_iri_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    key = F.concat(F.col("c_name"), F.lit(" #"), F.col("c_mktsegment"))
    return cust.select("c_custkey", iri_encode(key).alias("encoded_key"))


# c_name is 'Customer#NNN' — after space→'-' the only byte URLEncoder
# percent-escapes here is '#'; the oracle emulates that exact mapping.
P8_SQL = """
SELECT c_custkey,
       replace(replace(c_name || ' #' || c_mktsegment, ' ', '-'), '#', '%23') AS encoded_key
FROM customer
"""


# --- F6 — IRI construction by concatenation (Mapper.java:65-67,
#     FdpDimension.java:84-104)


def f6_observation_iri(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.concat_ws(
            "/",
            F.lit("http://example.org/dataset"),
            F.lit("observation"),
            F.col("l_orderkey").cast("string"),
            F.concat(F.lit("for-"), F.col("l_linenumber").cast("string")),
        ).alias("obs_iri"),
        F.concat_ws("-", F.col("l_returnflag"), F.col("l_linestatus")).alias("merged_key"),
    )


F6_SQL = """
SELECT
  'http://example.org/dataset' || '/observation/' || CAST(l_orderkey AS VARCHAR)
    || '/for-' || CAST(l_linenumber AS VARCHAR) AS obs_iri,
  l_returnflag || '-' || l_linestatus AS merged_key
FROM lineitem
"""


# --- F8 — localized number parse round-trip (FdpAttribute.java:48-65)


def f8_localized_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Formats acctbal as a Czech-style decimal-comma string, parses it
    back with the engine's localized parser; unparseable input → NULL."""
    cust = _t(spark, sf_dir, "customer")
    localized = F.replace(F.format_string("%.2f", F.col("c_acctbal")), F.lit("."), F.lit(","))
    mixed = F.when(F.col("c_custkey") % 10 == 0, F.lit("N/A")).otherwise(localized)
    return cust.select(
        "c_custkey",
        parse_localized_number(mixed, decimal_sep=",", group_sep=" ").alias("parsed"),
    )


F8_SQL = """
SELECT c_custkey,
       CASE WHEN c_custkey % 10 = 0 THEN NULL
            ELSE TRY_CAST(replace(replace(printf('%.2f', c_acctbal), '.', ','), ',', '.') AS DOUBLE)
       END AS parsed
FROM customer
"""


# --- F9 — measure factor + HALF_UP(2) (FdpMeasure.java:91-92)


def f9_money_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money_round(F.col("l_extendedprice"), 3.0).alias("amount"),
    )


F9_SQL = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice * 3.0, 2) AS amount
FROM lineitem
"""


# --- F5/F10 — lower/trim/length guard word pipeline (Parser.java:67-76)


def f10_word_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    words = F.explode(F.split(F.lower(F.trim(F.col("p_name"))), " "))
    return (
        part.select(words.alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


F10_SQL = """
SELECT word, count(*) AS n_occurrences
FROM (SELECT unnest(str_split(lower(trim(p_name)), ' ')) AS word FROM part) w
WHERE length(word) >= 2
GROUP BY word
"""


# --- P10 — case/switch recode (DcatAp11ToDkanBatch.java:383-404)


def p10_case_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "click", "C")
        .when(F.col("event_type") == "view", "V")
        .when(F.col("event_type") == "purchase", "P")
        .when(F.col("event_type") == "signup", "S")
        .otherwise("ST")
    )
    return events.select(code.alias("type_code")).groupBy("type_code").agg(
        F.count(F.lit(1)).alias("n_events")
    )


P10_SQL = """
SELECT CASE event_type
         WHEN 'click' THEN 'C' WHEN 'view' THEN 'V'
         WHEN 'purchase' THEN 'P' WHEN 'signup' THEN 'S'
         ELSE 'ST' END AS type_code,
       count(*) AS n_events
FROM events GROUP BY 1
"""


# --- F12 — nested JSON build (DcatAp11ToCkanBatch.java:321-509)


def f12_json_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.to_json(
            F.struct(
                F.col("n_name").alias("name"),
                F.col("n_regionkey").alias("region"),
            )
        ).alias("payload"),
    )


F12_SQL = """
SELECT n_nationkey,
       CAST(to_json(struct_pack(name := n_name, region := n_regionkey)) AS VARCHAR) AS payload
FROM nation
"""


# --- F13 — JSON path extraction (DcatAp11ToCkanBatch.java:95,126-135)


def f13_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


F13_SQL = """
SELECT event_type,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


# --- F14/S6 — N-Triples line formatting (PlainTextTripleWriter.java:27-57)


def f14_ntriples_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serializes nation rows as N-Triples: an IRI-object triple, a
    lang-tagged literal and a typed literal per row."""
    nation = _t(spark, sf_dir, "nation")
    s = F.concat(F.lit("http://example.org/nation/"), F.col("n_nationkey").cast("string"))
    region_iri = F.concat(F.lit("http://example.org/region/"), F.col("n_regionkey").cast("string"))
    lines = F.array(
        format_ntriple(s, F.lit("http://example.org/ns#region"), region_iri, o_kind=F.lit("iri")),
        format_ntriple(s, F.lit("http://www.w3.org/2004/02/skos/core#prefLabel"), F.col("n_name"), o_lang=F.lit("en")),
        format_ntriple(
            s,
            F.lit("http://example.org/ns#key"),
            F.col("n_nationkey").cast("string"),
            o_datatype=F.lit("http://www.w3.org/2001/XMLSchema#integer"),
        ),
    )
    return nation.select(F.explode(lines).alias("nt_line"))


F14_SQL = """
WITH base AS (
  SELECT 'http://example.org/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
         n_name,
         n_nationkey,
         'http://example.org/region/' || CAST(n_regionkey AS VARCHAR) AS region_iri
  FROM nation
)
SELECT nt_line FROM (
  SELECT printf('<%s> <%s> %s .', s, 'http://example.org/ns#region', '<' || region_iri || '>') AS nt_line FROM base
  UNION ALL
  SELECT printf('<%s> <%s> %s .', s, 'http://www.w3.org/2004/02/skos/core#prefLabel', '"' || n_name || '"@en') FROM base
  UNION ALL
  SELECT printf('<%s> <%s> %s .', s, 'http://example.org/ns#key',
                '"' || CAST(n_nationkey AS VARCHAR) || '"^^<http://www.w3.org/2001/XMLSchema#integer>') FROM base
) t
"""


QUERIES = {
    "f1_keyword_sanitize": f1_keyword_sanitize,
    "f2_regex_extract_rewrite": f2_regex_extract_rewrite,
    "p11_date_classify": p11_date_classify,
    "p7_slugify": p7_slugify,
    "p8_iri_encode": p8_iri_encode,
    "f6_observation_iri": f6_observation_iri,
    "f8_localized_number": f8_localized_number,
    "f9_money_round": f9_money_round,
    "f10_word_pipeline": f10_word_pipeline,
    "p10_case_recode": p10_case_recode,
    "f12_json_build": f12_json_build,
    "f13_json_extract": f13_json_extract,
    "f14_ntriples_format": f14_ntriples_format,
}

ORACLES = {
    "f1_keyword_sanitize": F1_SQL,
    "f2_regex_extract_rewrite": F2_SQL,
    "p11_date_classify": P11_SQL,
    "p7_slugify": P7_SQL,
    "p8_iri_encode": P8_SQL,
    "f6_observation_iri": F6_SQL,
    "f8_localized_number": F8_SQL,
    "f9_money_round": F9_SQL,
    "f10_word_pipeline": F10_SQL,
    "p10_case_recode": P10_SQL,
    "f12_json_build": F12_SQL,
    "f13_json_extract": F13_SQL,
    "f14_ntriples_format": F14_SQL,
}
