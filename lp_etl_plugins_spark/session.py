"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]``; the confs below are chosen so the same
logical plans scale to a real cluster: AQE on (runtime re-plan, skew-join
handling, partition coalescing), Arrow on (fast pandas-UDF boundary),
shuffle partitions sized to the test box rather than the 200 default.

Note: engine code never *requires* this session — every public function
takes the caller's SparkSession/DataFrames, so it composes with whatever
session a host application (or the correctness driver) provides.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "lp_etl_plugins_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # TESTDATA events.ts is TIMESTAMP(NANOS); Spark reads it as long
        # under this flag (tables.load_table rebuilds the timestamp).
        # Declared here, once, so readers don't mutate session conf.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # local mode: driver == executor, so size the one JVM for the
        # box (default heap starves 32 concurrent task threads into GC)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # PySpark 4 captures the Python call site for error context on
        # EVERY DataFrame/Column op — 2 extra Py4J roundtrips per call.
        # Plan-heavy builders (the cube compiler emits ~70 conditional
        # structs) spend more time in that chatter than in Catalyst;
        # disabling it measured ~2× faster plan construction.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # literal IN filters push to parquet as-is up to this many
        # values (beyond it Spark degrades the pushdown to a min/max
        # range, which hash-distributed keys make useless) — the
        # RepeatIndex retraction's flipped-gram locate relies on IN
        # pushdown over the g-sorted compacted layout to prune files
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "2048")
    )
    return builder.getOrCreate()
