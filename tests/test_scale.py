"""Shuffle-control utilities: bucketed co-located joins (plan-asserted
shuffle-free) and salted aggregation for skewed keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lp_etl_plugins_spark import util
from lp_etl_plugins_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucket_test LOCATION '{loc}'")
    yield "bucket_test"
    spark.sql("DROP DATABASE bucket_test CASCADE")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    util.write_bucketed(orders, f"{bucket_db}.orders_b", ["o_orderkey"], 8)
    util.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        f"{bucket_db}.lineitem_b",
        ["o_orderkey"],
        8,
    )
    o = util.read_bucketed_table(spark, f"{bucket_db}.orders_b")
    l = util.read_bucketed_table(spark, f"{bucket_db}.lineitem_b")
    joined = o.join(l, "o_orderkey").groupBy("o_orderstatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("rev")
    )
    plan = _executed_plan(joined)
    # the join must be co-located: no Exchange on the join key anywhere
    # in the plan (the sort-merge join consumes the bucketed scans
    # directly; only the final agg may exchange, on its own key)
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    # and the result is right
    expect = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expect.collect()))


def test_salted_aggregate_matches_plain(spark):
    lineitem = load_table(spark, SF, "lineitem")
    salted = util.salted_aggregate(
        lineitem,
        ["l_returnflag"],
        {
            "sum_qty": F.sum("l_quantity"),
            "cnt_rows": F.count(F.lit(1)),
            "min_ship": F.min("l_shipdate"),
            "max_ship": F.max("l_shipdate"),
        },
        n_salts=8,
    )
    plain = lineitem.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_rows"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_aggregate_rejects_non_decomposable(spark):
    lineitem = load_table(spark, SF, "lineitem")
    with pytest.raises(ValueError, match="recombine"):
        util.salted_aggregate(
            lineitem, ["l_returnflag"], {"avg_qty": F.avg("l_quantity")}
        ).collect()
