"""lp_etl_plugins_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of
the LinkedPipes-ETL plugin suite ``opendatacz/lp-etl-plugins`` (see
SURVEY.md), re-expressed Spark-first.

Shipped modules:

- ``model``      — RDF triples-as-DataFrame data model: Turtle subset
                   parser (driver-side), distributed N-Triples reader,
                   N-Triples sink, relational→triples unpivot (SURVEY §1.1)
- ``graphq``     — graph (SPARQL-shaped) query layer over triples:
                   bgp/optional/not_exists/values/path/lang_filter/
                   group_count/scalar (SURVEY §2.3, §7.2)
- ``graphq_local`` — driver-local twin of graphq for metadata graphs:
                   plan-time spec extraction without Spark jobs
- ``cube``       — Fiscal-Data-Package descriptor → RDF Data Cube
                   compiler, all 7 dimension kinds (reference t-fdpToRdf)
- ``dcat``       — DCAT-AP extraction → CKAN payloads + JSONL sink,
                   pivot-based set-oriented rewrite (SURVEY §3.2)
- ``registry``   — the LP-ETL "component" surface: named pipeline
                   stages + composition (built-ins: the 5 §2.8 ops)
- ``catalog``    — REST catalog connectors: paged sources, idempotent
                   CKAN upsert, delete/form sinks with capped retries,
                   ckan_purge / dkan_purge pipelines
- ``streaming``  — Structured Streaming windows (tumbling / sliding /
                   session + watermark), batch-equivalent by design
- ``textops``    — training-data text ops: exact/fingerprint dedup,
                   MinHash+banded-LSH near-dup, connected-components
                   dedup clusters, winnowing fingerprints, SimHash,
                   language-ID, quality scoring, token counting
- ``vectorops``  — similarity search over embeddings: brute-force
                   cosine top-k, sign-bucket LSH, IVF coarse lists,
                   bit-packed Hamming prefilter
- ``multimodal`` — binary media columns: Arrow-batched decode / resize /
                   frame-sample plumbing (codec stubbed, see module)
- ``functions``  — scalar expression library (text/dates/numeric/rdf),
                   built-in-function compositions, one pandas UDF (NFD)
- ``inventory``  — the correctness surface: one query + DuckDB oracle per
                   implemented operator from SURVEY §2
- ``tables``     — loaders for the driver-generated test tables
- ``session``    — SparkSession factory (AQE, Arrow, UTC)
- ``testing``    — local oracle-parity harness mirroring the driver check

Everything is declarative DataFrame code so Catalyst handles pushdown,
pruning, join selection and whole-stage codegen; Python-side row code is
limited to a handful of clearly-marked pandas UDFs.
"""

__version__ = "0.2.0"
