"""lp_etl_plugins_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of
the LinkedPipes-ETL plugin suite ``opendatacz/lp-etl-plugins`` (see
SURVEY.md), re-expressed Spark-first:

- ``model``      — RDF triples-as-DataFrame data model + loaders (SURVEY §1.1)
- ``graphq``     — graph (SPARQL-shaped) query layer over triples (SURVEY §2.3)
- ``plans.cube`` — Fiscal-Data-Package descriptor → RDF Data Cube compiler
                   (reference: t-fdpToRdf, SURVEY §3.1)
- ``dcat``       — DCAT-AP extraction → CKAN/DKAN payloads (SURVEY §3.2)
- ``catalog``    — REST catalog connectors + purge pipelines (SURVEY §2.1 S5,S9-S11)
- ``operators``  — large-scale training-data ops: dedup, similarity search,
                   text analysis, multimodal columns
- ``streaming``  — Structured Streaming windows over event streams

Everything is declarative DataFrame code so Catalyst handles pushdown,
pruning, join selection and whole-stage codegen; Python-side row code is
limited to a handful of clearly-marked pandas UDFs.
"""

__version__ = "0.1.0"
