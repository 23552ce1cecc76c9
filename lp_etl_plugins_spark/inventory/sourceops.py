"""Source/sink inventory (SURVEY §2.1) — s* entries over committed
fixtures.

- s1: S1 dialect-driven CSV scan (data-driven delimiter/quote,
  all-string schema — Parser.java:32-65, HeaderParser.java:49-55)
- s2: S2 single-column CSV id read (CsvReader.java:17-39)
- s3: S3/S4 distributed N-Triples parse (spark.read.text + regexp,
  FdpToRdf.java:306-311 passthrough generalized to a real parser)

DuckDB oracles re-read the same fixture files (read_csv / read_text),
so the scan semantics — dialect handling, null cells, literal
escape decoding — are hash-checked, not just row counts. The N-Triples
sink side (S6/S8) is exercised by round-trip pytest goldens
(tests/test_model_graphq.py, tests/test_dcat.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FIXTURES = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures"))
_CSV = os.path.join(_FIXTURES, "fdp", "budget.csv")
_IDS_CSV = os.path.join(_FIXTURES, "ids.csv")
_NT = os.path.join(_FIXTURES, "sample.nt")


def s1_csv_dialect_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialected CSV scan (';' delimiter, '\"' quote, header,
    all-string): every cell surfaces exactly as the reference's
    SuperCSV reader would hand it to the mapper (empty → NULL)."""
    from ..cube import CsvDialect, read_csv_with_dialect

    df = read_csv_with_dialect(spark, _CSV, CsvDialect(delimiter=";", quote='"'))
    return df.select(
        "amount",
        "descr",
        "category",
        "m2",
        F.length("amount").alias("amount_len"),
    )


S1_SQL = f"""
SELECT amount, descr, category, m2, length(amount) AS amount_len
FROM read_csv('{_CSV}', delim=';', quote='"', header=true, all_varchar=true)
"""


def s2_id_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-column id read: first CSV column, header skipped."""
    from ..catalog import read_id_column

    return read_id_column(spark, _IDS_CSV)


S2_SQL = f"""
SELECT id
FROM read_csv('{_IDS_CSV}', delim=',', quote='"', header=true, all_varchar=true)
"""


def s3_ntriples_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed N-Triples parse: IRIs, lang/typed literals, bnodes,
    escape decoding; comments and blank lines dropped."""
    from ..model import triples_from_ntriples

    return triples_from_ntriples(spark, _NT)


# read_text → per-line regexp extraction; escape decoding mirrors the
# fixture's escapes (\" and \n — decode order safe for NT's charset)
S3_SQL = rf"""
WITH lines AS (
  SELECT unnest(string_split(content, chr(10))) AS line
  FROM read_text('{_NT}')
),
parsed AS (
  SELECT
    regexp_extract(line, '^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(.*?)\s*\.\s*$', 1) AS s_raw,
    regexp_extract(line, '^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(.*?)\s*\.\s*$', 2) AS p,
    regexp_extract(line, '^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(.*?)\s*\.\s*$', 3) AS o_raw
  FROM lines
)
SELECT
  CASE WHEN s_raw LIKE '<%' THEN s_raw[2:-2] ELSE s_raw END AS s,
  p,
  CASE WHEN o_raw LIKE '<%' THEN o_raw[2:-2]
       WHEN o_raw LIKE '_:%' THEN o_raw
       ELSE replace(replace(replace(
              regexp_extract(o_raw, '^"((?:[^"\\]|\\.)*)"', 1),
              '\n', chr(10)), '\"', '"'), '\\', '\')
  END AS o_value,
  CASE WHEN o_raw LIKE '<%' THEN 'iri'
       WHEN o_raw LIKE '_:%' THEN 'bnode'
       ELSE 'literal' END AS o_type,
  CASE WHEN o_raw NOT LIKE '<%' AND o_raw NOT LIKE '_:%'
        AND regexp_extract(o_raw, '^"(?:[^"\\]|\\.)*"@([A-Za-z][A-Za-z0-9\-]*)\s*$', 1) != ''
       THEN lower(regexp_extract(o_raw, '^"(?:[^"\\]|\\.)*"@([A-Za-z][A-Za-z0-9\-]*)\s*$', 1))
  END AS o_lang,
  CASE WHEN o_raw NOT LIKE '<%' AND o_raw NOT LIKE '_:%'
        AND regexp_extract(o_raw, '^"(?:[^"\\]|\\.)*"\^\^<([^>]*)>\s*$', 1) != ''
       THEN regexp_extract(o_raw, '^"(?:[^"\\]|\\.)*"\^\^<([^>]*)>\s*$', 1)
  END AS o_datatype
FROM parsed
WHERE p != '' AND o_raw != ''
"""


def s4_nt_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/U1 passthrough union (FdpToRdf.java:298-311): pre-made `.nt`
    triples appended to engine-generated triples in ONE output relation
    — the same unionByName the cube sink performs, hash-checked."""
    from ..model import TRIPLES_SCHEMA, triples_from_ntriples

    generated = spark.createDataFrame(
        [
            ("urn:gen/obs/1", "urn:gen/p/amount", "12.50", "literal", None,
             "http://www.w3.org/2001/XMLSchema#decimal"),
            ("urn:gen/obs/1", "urn:gen/p/label", "generated", "literal", None, None),
        ],
        TRIPLES_SCHEMA,
    )
    return generated.unionByName(triples_from_ntriples(spark, _NT))


S4_SQL = (
    """
SELECT * FROM (VALUES
  ('urn:gen/obs/1', 'urn:gen/p/amount', '12.50', 'literal', NULL,
   'http://www.w3.org/2001/XMLSchema#decimal'),
  ('urn:gen/obs/1', 'urn:gen/p/label', 'generated', 'literal', NULL, NULL)
) AS g(s, p, o_value, o_type, o_lang, o_datatype)
UNION ALL
SELECT * FROM ("""
    + S3_SQL
    + ")"
)


QUERIES = {
    "s1_csv_dialect_scan": s1_csv_dialect_scan,
    "s2_id_column": s2_id_column,
    "s3_ntriples_scan": s3_ntriples_scan,
    "s4_nt_passthrough": s4_nt_passthrough,
}

ORACLES = {
    "s1_csv_dialect_scan": S1_SQL,
    "s2_id_column": S2_SQL,
    "s3_ntriples_scan": S3_SQL,
    "s4_nt_passthrough": S4_SQL,
}
