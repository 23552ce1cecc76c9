"""fdp_to_cube inventory (SURVEY §2.8 / §3.1) — c* entries.

``c1_fdp_cube`` runs the WHOLE flagship transformer end-to-end on the
committed fixture (descriptor + dialected CSV, tests/fixtures/fdp/) and
returns the triples relation; the DuckDB oracle independently rebuilds
every emission rule of the reference — the 7 dimension kinds
(FdpToRdf.java:134-185), label folding (FdpDimension.java:47-54),
hierarchy ordering (HierarchicalDimension.java:81-103), localized
number parsing + HALF_UP rounding (FdpAttribute.java:48-65,
FdpMeasure.java:91-92), date-shape classification
(DateDimension.java:64-81), observation numbering (Mapper.java:32,85)
and the codelist dedup contract (SURVEY §4) — as SQL over the same CSV.

The fixture is sf-independent (a descriptor-driven transformer has no
sf-scaled input), so ``sf_dir`` is ignored; the correctness value is in
the full-semantics hash match, not data volume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "fdp")
_DESCRIPTOR = os.path.abspath(os.path.join(_FIXTURE_DIR, "descriptor.ttl"))
_CSV = os.path.abspath(os.path.join(_FIXTURE_DIR, "budget.csv"))


def c1_fdp_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..cube import fdp_to_cube
    from ..model import triples_from_turtle

    descriptor = triples_from_turtle(spark, _DESCRIPTOR)
    return fdp_to_cube(spark, descriptor, {"budget.csv": _CSV})


_XSD_DEC = "http://www.w3.org/2001/XMLSchema#decimal"
_SKOS = "http://www.w3.org/2004/02/skos/core#"
_QB = "http://purl.org/linked-data/cube#"
_A = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_GREG = "http://reference.data.gov.uk/id/gregorian-"
_AMOUNT = "http://data.openbudgets.eu/ontology/dsd/measure/amount"
_OBEU_DIM = "http://data.openbudgets.eu/ontology/dsd/dimension/"
_OBEU_ATTR = "http://data.openbudgets.eu/ontology/dsd/attribute/"
_CL = "http://data.openbudgets.eu/resource/testpkg/codelist/"

C1_SQL = f"""
WITH raw AS (
  SELECT *, row_number() OVER () AS rn
  FROM read_csv('{_CSV}', delim=';', quote='"', header=true, all_varchar=true)
),
b AS (
  SELECT *,
    'urn:fx/dataset/observation/' || rn || '/for-amount' AS obs,
    TRY_CAST(replace(replace(amount, ' ', ''), ',', '.') AS DOUBLE) AS parsed,
    'urn:fx/dataset/category/' || replace(category, ' ', '-') AS cat_iri,
    'urn:fx/dataset/pair/' ||
      concat_ws('-', replace(m1, ' ', '-'), replace(m2, ' ', '-')) AS pair_iri,
    'urn:fx/dataset/prog/' || replace(prog_code, ' ', '-') AS prog_iri,
    'urn:fx/dataset/dept/' || replace(dept, ' ', '-') AS dept_iri,
    'urn:fx/dataset/division/' || replace(division, ' ', '-') AS div_iri,
    'urn:fx/dataset/org/' || replace(orgname, ' ', '-') AS org_iri,
    CASE WHEN regexp_matches(period, '^\\d{{4}}-\\d{{2}}-\\d{{2}}$')
           THEN '{_GREG}day/' || period
         WHEN regexp_matches(period, '^\\d{{4}}-\\d{{2}}-\\d{{2}}T\\d{{2}}:\\d{{2}}:\\d{{2}}$')
           THEN '{_GREG}interval/' || period
         WHEN regexp_matches(period, '^\\d{{4}}-\\d{{2}}$')
           THEN '{_GREG}month/' || period
         WHEN regexp_matches(period, '^\\d{{4}}$')
           THEN '{_GREG}year/' || period
    END AS date_iri
  FROM raw
),
rowtriples AS (
  SELECT obs AS s, 'urn:fx/dim/descr' AS p, descr AS o_value,
         'literal' AS o_type, NULL::VARCHAR AS o_lang, NULL::VARCHAR AS o_datatype
  FROM b WHERE descr IS NOT NULL
  UNION ALL SELECT obs, 'urn:fx/dim/category', cat_iri, 'iri', NULL, NULL
    FROM b WHERE category IS NOT NULL
  UNION ALL SELECT obs, 'urn:fx/dim/date', date_iri, 'iri', NULL, NULL
    FROM b WHERE date_iri IS NOT NULL
  UNION ALL SELECT obs, 'urn:fx/dim/pair', pair_iri, 'iri', NULL, NULL FROM b
  UNION ALL SELECT obs, 'urn:fx/dim/prog', prog_iri, 'iri', NULL, NULL
    FROM b WHERE prog_code IS NOT NULL
  UNION ALL SELECT obs, 'urn:fx/dim/tree',
      CASE WHEN dept IS NOT NULL THEN dept_iri
           WHEN division IS NOT NULL THEN div_iri END, 'iri', NULL, NULL
    FROM b WHERE dept IS NOT NULL OR division IS NOT NULL
  UNION ALL SELECT obs, 'urn:fx/dim/org', org_iri, 'iri', NULL, NULL
    FROM b WHERE orgname IS NOT NULL
  UNION ALL SELECT obs, '{_AMOUNT}',
      CAST(CAST(round(parsed * 2.0, 2) AS DECIMAL(38,2)) AS VARCHAR),
      'literal', NULL, '{_XSD_DEC}'
    FROM b WHERE amount IS NOT NULL AND parsed IS NOT NULL
  UNION ALL SELECT obs, '{_AMOUNT}', amount, 'literal', NULL, NULL
    FROM b WHERE amount IS NOT NULL AND parsed IS NULL
  UNION ALL SELECT obs, '{_OBEU_DIM}budgetPhase', 'urn:fx/phase/approved', 'iri', NULL, NULL
    FROM b WHERE amount IS NOT NULL
  UNION ALL SELECT obs, '{_OBEU_ATTR}currency', 'urn:fx/currency/CZK', 'iri', NULL, NULL
    FROM b WHERE amount IS NOT NULL
  UNION ALL SELECT obs, '{_OBEU_DIM}currency', 'urn:fx/currency/CZK', 'iri', NULL, NULL
    FROM b WHERE amount IS NOT NULL
  UNION ALL SELECT 'urn:fx/dataset', '{_QB}observation', obs, 'iri', NULL, NULL FROM b
  UNION ALL SELECT obs, '{_A}', '{_QB}Observation', 'iri', NULL, NULL FROM b
  UNION ALL SELECT obs, '{_QB}dataSet', 'urn:fx/dataset', 'iri', NULL, NULL FROM b
),
codetriples AS (
  -- single_skos category
  SELECT cat_iri AS s, '{_A}' AS p, '{_SKOS}Concept' AS o_value,
         'iri' AS o_type, NULL::VARCHAR AS o_lang, NULL::VARCHAR AS o_datatype
  FROM b WHERE category IS NOT NULL
  UNION ALL SELECT cat_iri, '{_SKOS}prefLabel', category, 'literal', NULL, NULL
    FROM b WHERE category IS NOT NULL
  UNION ALL SELECT cat_iri, '{_SKOS}inScheme', '{_CL}category', 'iri', NULL, NULL
    FROM b WHERE category IS NOT NULL
  UNION ALL SELECT '{_CL}category', '{_A}', '{_SKOS}ConceptScheme', 'iri', NULL, NULL
    FROM b WHERE category IS NOT NULL
  UNION ALL SELECT '{_CL}category', '{_SKOS}hasTopConcept', cat_iri, 'iri', NULL, NULL
    FROM b WHERE category IS NOT NULL
  UNION ALL SELECT '{_CL}category', 'http://www.w3.org/2000/01/rdf-schema#label',
      'category', 'literal', NULL, NULL
    FROM b WHERE category IS NOT NULL
  UNION ALL SELECT 'urn:fx/dim/category', '{_QB}codeList', '{_CL}category', 'iri', NULL, NULL
    FROM b WHERE category IS NOT NULL
  -- date interval type
  UNION ALL SELECT date_iri, '{_A}', 'http://www.w3.org/2006/time#Interval', 'iri', NULL, NULL
    FROM b WHERE date_iri IS NOT NULL
  -- multi pair attribute values (valueType unknown -> no rdf:type)
  UNION ALL SELECT pair_iri, 'urn:fx/p/m1', m1, 'literal', NULL, NULL
    FROM b WHERE m1 IS NOT NULL
  UNION ALL SELECT pair_iri, 'urn:fx/p/m2', m2, 'literal', NULL, NULL
    FROM b WHERE m2 IS NOT NULL
  -- skos prog with folded label (attribute order: prog-code only)
  UNION ALL SELECT prog_iri, '{_SKOS}prefLabel', prog_label, 'literal', NULL, NULL
    FROM b WHERE prog_code IS NOT NULL AND prog_label IS NOT NULL
  UNION ALL SELECT prog_iri, '{_SKOS}notation', prog_code, 'literal', NULL, NULL
    FROM b WHERE prog_code IS NOT NULL AND prog_label IS NOT NULL
  UNION ALL SELECT prog_iri, 'urn:fx/p/progcode', prog_code, 'literal', NULL, NULL
    FROM b WHERE prog_code IS NOT NULL AND prog_label IS NULL
  UNION ALL SELECT prog_iri, '{_A}', '{_SKOS}Concept', 'iri', NULL, NULL
    FROM b WHERE prog_code IS NOT NULL
  UNION ALL SELECT prog_iri, '{_SKOS}prefLabel', replace(prog_code, ' ', '-'),
      'literal', NULL, NULL
    FROM b WHERE prog_code IS NOT NULL AND prog_label IS NULL
  UNION ALL SELECT prog_iri, '{_SKOS}inScheme', '{_CL}prog', 'iri', NULL, NULL
    FROM b WHERE prog_code IS NOT NULL
  UNION ALL SELECT '{_CL}prog', '{_A}', '{_SKOS}ConceptScheme', 'iri', NULL, NULL
    FROM b WHERE prog_code IS NOT NULL
  UNION ALL SELECT '{_CL}prog', '{_SKOS}hasTopConcept', prog_iri, 'iri', NULL, NULL
    FROM b WHERE prog_code IS NOT NULL
  UNION ALL SELECT '{_CL}prog', 'http://www.w3.org/2000/01/rdf-schema#label',
      'prog', 'literal', NULL, NULL
    FROM b WHERE prog_code IS NOT NULL
  UNION ALL SELECT 'urn:fx/dim/prog', '{_QB}codeList', '{_CL}prog', 'iri', NULL, NULL
    FROM b WHERE prog_code IS NOT NULL
  -- hierarchical tree: dept (child) level
  UNION ALL SELECT dept_iri, '{_SKOS}broader', div_iri, 'iri', NULL, NULL
    FROM b WHERE dept IS NOT NULL AND division IS NOT NULL
  UNION ALL SELECT dept_iri, '{_SKOS}notation', dept, 'literal', NULL, NULL
    FROM b WHERE dept IS NOT NULL
  UNION ALL SELECT dept_iri, '{_A}', '{_SKOS}Concept', 'iri', NULL, NULL
    FROM b WHERE dept IS NOT NULL
  UNION ALL SELECT dept_iri, '{_SKOS}inScheme', '{_CL}tree', 'iri', NULL, NULL
    FROM b WHERE dept IS NOT NULL
  -- hierarchical tree: division (top) level
  UNION ALL SELECT div_iri, '{_SKOS}notation', division, 'literal', NULL, NULL
    FROM b WHERE division IS NOT NULL
  UNION ALL SELECT div_iri, '{_A}', '{_SKOS}Concept', 'iri', NULL, NULL
    FROM b WHERE division IS NOT NULL
  UNION ALL SELECT div_iri, '{_SKOS}inScheme', '{_CL}tree', 'iri', NULL, NULL
    FROM b WHERE division IS NOT NULL
  UNION ALL SELECT '{_CL}tree', '{_SKOS}hasTopConcept', div_iri, 'iri', NULL, NULL
    FROM b WHERE division IS NOT NULL
  UNION ALL SELECT '{_CL}tree', '{_A}', '{_SKOS}ConceptScheme', 'iri', NULL, NULL
    FROM b WHERE dept IS NOT NULL OR division IS NOT NULL
  UNION ALL SELECT '{_CL}tree', 'http://www.w3.org/2000/01/rdf-schema#label',
      'tree', 'literal', NULL, NULL
    FROM b WHERE dept IS NOT NULL OR division IS NOT NULL
  UNION ALL SELECT 'urn:fx/dim/tree', '{_QB}codeList', '{_CL}tree', 'iri', NULL, NULL
    FROM b WHERE dept IS NOT NULL OR division IS NOT NULL
  -- single_object org
  UNION ALL SELECT org_iri, 'http://schema.org/name', orgname, 'literal', NULL, NULL
    FROM b WHERE orgname IS NOT NULL
  UNION ALL SELECT org_iri, '{_A}', 'http://schema.org/Organization', 'iri', NULL, NULL
    FROM b WHERE orgname IS NOT NULL
)
SELECT s, p, o_value, o_type, o_lang, o_datatype FROM rowtriples
UNION ALL
SELECT DISTINCT s, p, o_value, o_type, o_lang, o_datatype FROM codetriples
"""


QUERIES = {"c1_fdp_cube": c1_fdp_cube}
ORACLES = {"c1_fdp_cube": C1_SQL}
