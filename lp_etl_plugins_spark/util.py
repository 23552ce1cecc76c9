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

``asof_join`` is the generic temporal enrichment operator (j10 is its
events×orders instantiation): latest right row at-or-before each left
row's time, per key, via union-tag-sort carry-forward.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Distributed as-of join: for every left row, attach the latest
    right row with ``right_time <= left_time`` on the same ``key``
    (NULL payload when no such row exists); among right rows tied on
    time the greatest ``tiebreak`` (default: first payload column)
    wins, so the result is deterministic.

    Union-tag-sort carry-forward — the shuffle-minimal as-of plan:
    both inputs shuffle ONCE on the key, then one ordered window per
    key carries the latest right payload struct forward past each left
    row. No per-left-row subquery, no range-join pair blow-up; cost is
    one shuffle + one per-key sort of |left| + |right| rows. At equal
    time a right row sorts before a left row (tag 0 < 1), so
    'at-or-before' includes same-instant matches.

    Output: every left column, plus the payload columns; a payload
    name colliding with a left column raises up front (the join would
    otherwise silently emit an ambiguous duplicate column).

    Time columns may be numeric epochs or TIMESTAMPs — timestamps are
    compared at FULL microsecond precision (``unix_micros``), never
    truncated to seconds (a raw long cast would floor to the second
    and let a right row up to 999 ms in the future masquerade as
    'at-or-before'). Mixing a timestamp on one side with a numeric
    epoch on the other is rejected: the units silently wouldn't match.

    NULL handling follows SQL join semantics: right rows with a NULL
    key or NULL time are excluded up front (NULL = NULL is never true,
    and a null-timestamped row would sort earlier-than-everything in
    the carry-forward window); left rows with a NULL key get NULL
    payload."""
    tiebreak = tiebreak or payload[0]
    collide = set(payload) & set(left.columns)
    if collide:
        raise ValueError(
            f"asof_join: payload columns {sorted(collide)} collide with left "
            "columns - alias one side before joining"
        )

    def _is_ts(df: DataFrame, col_name: str) -> bool:
        return dict(df.dtypes)[col_name].startswith("timestamp")

    lt_ts, rt_ts = _is_ts(left, left_time), _is_ts(right, right_time)
    if lt_ts != rt_ts:
        raise ValueError(
            f"asof_join: {left_time!r} is "
            f"{'a timestamp' if lt_ts else 'numeric'} but {right_time!r} is "
            f"{'a timestamp' if rt_ts else 'numeric'} — convert one side so "
            "both times share a unit"
        )

    def _epoch(col_name: str, is_ts: bool):
        c = F.col(col_name)
        return F.unix_micros(c) if is_ts else c.cast("long")

    right = right.filter(F.col(right_time).isNotNull() & F.col(key).isNotNull())
    r_struct = F.struct(*[F.col(c) for c in payload])
    r_type = right.select(r_struct.alias("__r")).schema["__r"].dataType
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_type = left.select(l_struct.alias("__l")).schema["__l"].dataType
    lf = left.select(
        F.col(key).alias("__k"),
        _epoch(left_time, lt_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        l_struct.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    rf = right.select(
        F.col(key).alias("__k"),
        _epoch(right_time, rt_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct.alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__tag").asc(), F.col(f"__r.{tiebreak}").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lf.unionByName(rf).withColumn(
        "__c", F.last("__r", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__tag") == 1).select(
        "__l.*", *[F.col(f"__c.{c}").alias(c) for c in payload]
    )


def write_partitioned(df: DataFrame, path: str, keys: list[str]) -> None:
    """Persist hive-partitioned parquet (one directory level per key).
    Queries filtering on the partition keys scan only the matching
    directories — partition pruning, the coarsest and cheapest filter
    at 100 TB (the plan shows the predicate under PartitionFilters,
    asserted in tests/test_scale.py). Partition keys must be
    low-cardinality (source, date, language), never high-cardinality
    ids — one directory per value."""
    df.write.mode("overwrite").partitionBy(*keys).parquet(path)


def histogram_quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    width: float,
    qs: dict[str, float],
) -> DataFrame:
    """Mergeable fixed-grid quantile sketch — the quantile sibling of
    the HLL register table (inventory a9): the sketch is the per-group
    bucket-count table for ``bucket = floor(value / width)``, which is
    ADDITIVE (two sketches merge by summing bucket counts — partitions,
    corpus deltas, and stream micro-batches all combine losslessly),
    and the quantile estimate reads the cumulative distribution: the
    LOWER EDGE of the first bucket whose running count reaches
    ceil(q·n). Error is bounded by ``width`` by construction —
    engine-portable and deterministic (no sampling, no interpolation),
    unlike Spark's approx_percentile whose GK sketch no other engine
    reproduces. Scale shape: one map-side-combinable groupBy; the
    cumulative window runs over the BUCKET table (|groups| ×
    buckets-per-group rows), never the data. → one row per group:
    (*group_cols, n, <name> per qs entry)."""
    from pyspark.sql import Window as W

    bucket = F.floor(F.col(value_col) / F.lit(width))
    counts = df.groupBy(*group_cols, bucket.alias("__b")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_cum = (
        W.partitionBy(*group_cols)
        .orderBy("__b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = counts.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
        "__n", F.sum("__c").over(W.partitionBy(*group_cols))
    )
    aggs = [F.max("__n").alias("n")]
    for name, q in qs.items():
        aggs.append(
            F.min(
                F.when(
                    F.col("__cum") >= F.ceil(F.lit(q) * F.col("__n")),
                    F.col("__b"),
                )
            ).cast("double").alias(f"__b_{name}")
        )
    est = cum.groupBy(*group_cols).agg(*aggs)
    out = est.select(
        *group_cols,
        "n",
        *[
            (F.col(f"__b_{name}") * F.lit(width)).alias(name)
            for name in qs
        ],
    )
    return out
