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
