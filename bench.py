"""Benchmark runner — prints ONE JSON line with per-query wall times.

Runs the headline inventory queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is fully
materialized with a noop-format write so scan+shuffle+compute+serialize
are all inside the clock — ``count()`` would let Catalyst prune
projection-only expressions out of the measured plan.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _materialize(df) -> None:
    # noop source executes the complete physical plan (every expression,
    # window, UDF) and discards rows; nothing is pruned and nothing is
    # collected to the driver.
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)

    from lp_etl_plugins_spark import inventory
    from lp_etl_plugins_spark.session import get_spark

    spark = get_spark("lp_etl_plugins_spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = inventory.all_queries()
    # Warm-up: JVM/JIT + parquet footers (q1), and the Py4J
    # createDataFrame/broadcast first-use path (j4) so per-query numbers
    # measure plans, not one-time setup.
    for warm in ("q1_pricing_summary", "j4_values_lookup"):
        if warm in queries:
            _materialize(queries[warm](spark, sf_dir))
    # ...and the Python UDF worker pool (one trivial Arrow roundtrip),
    # so the first pandas-UDF/mapInPandas query measured isn't charged
    # the daemon spin-up the others get for free.
    import pandas as pd  # noqa: F401

    _materialize(
        spark.range(1).mapInPandas(lambda it: it, "id long")
    )

    import gc

    timings: dict[str, float] = {}
    for name in sorted(queries):
        fn = queries[name]
        t0 = time.perf_counter()
        _materialize(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
        # drop references to the query's checkpoint/broadcast blocks so
        # the ContextCleaner frees them between queries instead of
        # letting executor-memory pressure bleed into later timings
        gc.collect()

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "inventory_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
