"""Edge-case tests for the generic as-of join (util.asof_join).

The j10 driver query exercises the happy path on real tables (every
event user has prior orders, so the NULL leg never fires there); these
constructed frames pin the contract: no-prior-right → NULL payload,
same-instant right row visible, time ties break to the greatest
tiebreak value, keys with no left rows emit nothing.
"""

from __future__ import annotations

from lp_etl_plugins_spark.util import asof_join


def _run(spark):
    left = spark.createDataFrame(
        [
            ("a", 5, "a5"),
            ("a", 10, "a10"),
            ("a", 25, "a25"),
            ("b", 100, "b100"),
        ],
        "k string, lt long, name string",
    )
    right = spark.createDataFrame(
        [
            ("a", 10, 1, 1.0),
            ("a", 10, 2, 2.0),  # same-time tie: id 2 must win
            ("a", 20, 3, 3.0),
            ("c", 1, 9, 9.0),  # key with no left rows: no output
        ],
        "k string, rt long, rid long, rv double",
    )
    out = asof_join(
        left, right, key="k", left_time="lt", right_time="rt",
        payload=["rid", "rv"], tiebreak="rid",
    )
    return {r["name"]: (r["rid"], r["rv"]) for r in out.collect()}


def test_asof_edges(spark):
    got = _run(spark)
    assert got == {
        "a5": (None, None),      # before any right row
        "a10": (2, 2.0),         # same-instant match, tie -> max rid
        "a25": (3, 3.0),         # latest at-or-before
        "b100": (None, None),    # key with no right rows at all
    }


def test_asof_null_right_time_is_excluded(spark):
    # a NULL right_time sorts NULLS FIRST in the carry-forward window;
    # without the up-front filter it would be attached as the "latest
    # at-or-before" match for left rows that have no real predecessor
    left = spark.createDataFrame([("a", 5, "a5")], "k string, lt long, name string")
    right = spark.createDataFrame(
        [("a", None, 1, 1.0)], "k string, rt long, rid long, rv double"
    )
    rows = asof_join(
        left, right, key="k", left_time="lt", right_time="rt", payload=["rid", "rv"]
    ).collect()
    assert len(rows) == 1
    assert (rows[0]["rid"], rows[0]["rv"]) == (None, None)


def test_asof_keeps_all_left_columns_and_rows(spark):
    left = spark.createDataFrame(
        [("a", 1, "x", "extra")], "k string, lt long, name string, other string"
    )
    right = spark.createDataFrame([("a", 1, 7)], "k string, rt long, rid long")
    rows = asof_join(
        left, right, key="k", left_time="lt", right_time="rt", payload=["rid"]
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["k"], r["lt"], r["name"], r["other"], r["rid"]) == ("a", 1, "x", "extra", 7)


def test_asof_timestamp_compares_at_microsecond_precision(spark):
    """A right timestamp 800 ms AFTER the left must not match (a raw
    long cast would floor both to the same second and attach it)."""
    import datetime as dt

    left = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 10, 0, 0, 100000), 1)],
        "k string, lt timestamp, lid long",
    )
    right = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 10, 0, 0, 900000), 99),  # .8s future
            ("a", dt.datetime(2024, 1, 1, 9, 59, 59, 900000), 7),  # past
        ],
        "k string, rt timestamp, rid long",
    )
    rows = asof_join(
        left, right, key="k", left_time="lt", right_time="rt", payload=["rid"]
    ).collect()
    assert len(rows) == 1
    assert rows[0]["rid"] == 7


def test_asof_rejects_mixed_time_units(spark):
    import pytest as _pytest

    left = spark.createDataFrame([("a", 1, 1)], "k string, lt long, lid long")
    import datetime as dt

    right = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 7)],
        "k string, rt timestamp, rid long",
    )
    with _pytest.raises(ValueError, match="share a unit"):
        asof_join(left, right, key="k", left_time="lt", right_time="rt", payload=["rid"])


def test_asof_null_key_left_row_gets_null_payload(spark):
    """SQL semantics: NULL keys never match — even other NULL keys."""
    left = spark.createDataFrame([(None, 5, 1)], "k string, lt long, lid long")
    right = spark.createDataFrame([(None, 1, 7)], "k string, rt long, rid long")
    rows = asof_join(
        left, right, key="k", left_time="lt", right_time="rt", payload=["rid"]
    ).collect()
    assert len(rows) == 1
    assert rows[0]["rid"] is None


def test_asof_join_payload_collision_raises(spark):
    """A payload column name colliding with a left column fails loudly
    instead of emitting an ambiguous duplicate column."""
    import pytest

    from lp_etl_plugins_spark.util import asof_join

    left = spark.createDataFrame([(1, 10, "x")], "k long, t long, v string")
    right = spark.createDataFrame([(1, 5, "y")], "k long, t2 long, v string")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, key="k", left_time="t", right_time="t2", payload=["v"])
