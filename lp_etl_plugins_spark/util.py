"""Small pipeline utilities.

``observe_rows`` is the engine's A6 (progress counting,
DcatAp11ToCkanBatch.java:192,608 / CkanPurger.java:45): Spark's
Observation API attaches a metric to the plan that materializes with
the action — progress without a second pass or an accumulator UDF.

``write_bucketed`` / ``read_bucketed_table`` and ``salted_aggregate``
are the engine's shuffle-control surface for 100 TB runs: bucketing
co-locates repeated join/agg keys at write time (the join plan carries
NO Exchange — asserted in tests/test_scale.py), and salting splits a
hot key across ``n_salts`` reducers before the final combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def observe_rows(df: DataFrame, name: str = "progress") -> tuple[DataFrame, Observation]:
    """Attach a row-count observation; read ``obs.get['rows']`` after
    the first action on the returned frame."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


def write_bucketed(
    df: DataFrame, table: str, keys: list[str], n_buckets: int = 32
) -> None:
    """Persist a table bucketed+sorted by its join/agg keys. Joins and
    aggregations between tables bucketed the same way on the same keys
    run shuffle-free: each task reads matching buckets from both sides
    (co-located join), so a fact table joined repeatedly on the same
    key pays its shuffle ONCE at write time instead of per query."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a table written by :func:`write_bucketed`; the scan reports
    its bucketing to the planner, which drops the Exchange on joins
    keyed by the bucket columns."""
    return spark.table(table)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: a random salt spreads
    each key over ``n_salts`` partial reducers, then the partials
    combine in a second (tiny) shuffle. Only decomposable aggregates
    belong here — ``aggs`` maps output name → partial expression, and
    the combine phase re-applies SUM/MIN/MAX by name prefix:
    ``sum_*``/``cnt_*`` re-sum, ``min_*`` re-min, ``max_*`` re-max.

    Spark's AQE skew handling splits oversized *join* partitions; this
    helper is for the groupBy side, where a single hot key otherwise
    lands on one reducer regardless of AQE."""

    def _recombine(name: str) -> Column:
        if name.startswith(("sum_", "cnt_", "n_")):
            return F.sum(name).alias(name)
        if name.startswith("min_"):
            return F.min(name).alias(name)
        if name.startswith("max_"):
            return F.max(name).alias(name)
        raise ValueError(
            f"salted_aggregate: cannot recombine {name!r}; use a "
            "sum_/cnt_/n_/min_/max_ prefix"
        )

    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return partial.groupBy(*keys).agg(*[_recombine(n) for n in aggs])
