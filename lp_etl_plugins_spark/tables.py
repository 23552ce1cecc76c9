"""Loaders for the driver-generated test tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under ``{sf_dir}/{name}.parquet``.

These helpers do a plain ``spark.read.parquet`` so Catalyst keeps full
pushdown/pruning capability; nothing is cached or collected here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) which Spark's parquet reader rejects;
        # read nanos as long and rebuild a microsecond timestamp. `div` is
        # integer division — float division would lose precision on int64
        # epoch-nanos (~1.7e18 > 2^53).
        #
        # The legacy flag is process-wide and consulted at scan *execution*
        # time, so it cannot be save/restored around this lazy read. It is
        # set in session.get_spark for our own sessions; setting it here too
        # keeps the loader correct under a caller-provided session (e.g. the
        # correctness driver's). It is only ever set to "true", so repeated
        # calls are idempotent and no other value is ever clobbered.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path).withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
