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

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as TIMESTAMP(NANOS) in some testdata
        # generations (which Spark's parquet reader rejects without the
        # legacy long fallback) and as TIMESTAMP(MICROS)/NTZ in others —
        # dispatch on what the file actually contains.
        #
        # Both flags are process-wide and consulted at scan *execution*
        # time, so they cannot be save/restored around this lazy read. They
        # are set in session.get_spark for our own sessions; setting them
        # here too keeps the loader correct under a caller-provided session
        # (e.g. the correctness driver's). Repeated calls are idempotent;
        # the documented limitation: a host that explicitly set either
        # conf to the OTHER value has it overridden process-wide here —
        # reading `events` requires these settings, so the override is
        # loud in this comment rather than silent in behavior.
        #
        # inferTimestampNTZ=false reads a non-UTC-adjusted parquet timestamp
        # as plain TIMESTAMP whose instant micros are the stored micros
        # verbatim — byte-identical to DuckDB's epoch_us(ts) and independent
        # of spark.sql.session.timeZone. The NTZ alternative cannot be used:
        # streaming watermarks reject TIMESTAMP_NTZ event time
        # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and every public NTZ→LTZ
        # conversion shifts by the session zone.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # TIMESTAMP(NANOS) read as epoch-nanos long: rebuild a
            # microsecond timestamp. `div` is integer division — float
            # division would lose precision on int64 epoch-nanos
            # (~1.7e18 > 2^53).
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def wall_timestamp(df: DataFrame, name: str):
    """Session-timezone-INDEPENDENT wall-clock view of a parquet
    timestamp column, whichever type the ambient confs made it:

    - read as TIMESTAMP_NTZ (default session): already tz-free, pass
      through;
    - read as TIMESTAMP/LTZ (our tuned session, or any session after
      the events-loader confs leak process-wide — see load_table):
      render the instant in UTC via ``convert_timezone``, which by the
      loader's instant-micros == stored-micros guarantee recovers the
      stored wall time exactly, regardless of
      ``spark.sql.session.timeZone``.

    Use this for any date RENDERING or calendar arithmetic
    (date_format / to_date / datediff / literal comparison) — those
    operate on LTZ values through the session zone, so without the
    normalization a non-UTC session shifts day boundaries and the
    result diverges from the (tz-free) DuckDB oracle."""
    c = F.col(name)
    if dict(df.dtypes)[name] == "timestamp_ntz":
        return c
    return F.convert_timezone(None, F.lit("UTC"), c)


def wall_literal(df: DataFrame, name: str, wall: str):
    """A timestamp LITERAL matching ``name``'s read type whose meaning
    is the wall-clock string ``wall`` independent of the session zone
    — for COMPARISONS against a raw timestamp column. Unlike wrapping
    the column in :func:`wall_timestamp`, the column side stays
    untouched, so the predicate still pushes down to the parquet scan
    (a wrapped column turns a PushedFilters row-group prune into a
    full scan + post-filter — measured 2× on q1). NTZ read → NTZ
    literal (tz-free cast); LTZ read → the instant built DIRECTLY
    from epoch micros via ``timestamp_micros`` (a string literal
    would be parsed through the session zone — even
    ``to_utc_timestamp`` composes with that cast), which by the
    loader's instant-micros == stored-micros guarantee compares
    against exactly the stored wall time."""
    if dict(df.dtypes)[name] == "timestamp_ntz":
        return F.lit(wall).cast("timestamp_ntz")
    import datetime as _dt

    wall_dt = _dt.datetime.fromisoformat(wall).replace(tzinfo=_dt.timezone.utc)
    micros = int(wall_dt.timestamp() * 1_000_000)
    return F.timestamp_micros(F.lit(micros))
