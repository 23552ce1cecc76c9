"""Every inventory query must match its DuckDB oracle exactly at sf0.001.

This mirrors the driver's CORRECTNESS gate (row count + schema +
order-insensitive values) so regressions surface locally first.
"""

from __future__ import annotations

import pytest

from lp_etl_plugins_spark import inventory
from lp_etl_plugins_spark.testing import check_parity

from conftest import SF_SMOKE

_QUERIES = inventory.all_queries()
_ORACLES = inventory.all_oracles()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, name):
    res = check_parity(spark, SF_SMOKE, name, _QUERIES[name], _ORACLES.get(name))
    assert res.ok, str(res)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_date_queries_tz_independent(spark):
    """q1/p11/j10 must hash-match their oracles even under a hostile
    session (LTZ parquet reads + non-UTC session zone) — the condition
    that previously shifted day boundaries. The tuned test session
    already reads LTZ; only the zone needs flipping."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        for name in ("q1_pricing_summary", "p11_date_classify", "j10_asof_join"):
            res = check_parity(spark, SF_SMOKE, name, _QUERIES[name], _ORACLES[name])
            assert res.ok, str(res)
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
