"""Benchmark runner — prints ONE JSON line with per-query wall times.

Runs the headline inventory queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is timed
end-to-end including the action (collect of aggregated results / count
for wide outputs) so scan+shuffle+compute are all inside the clock.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)

    from lp_etl_plugins_spark import inventory
    from lp_etl_plugins_spark.session import get_spark

    spark = get_spark("lp_etl_plugins_spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = inventory.all_queries()
    # Warm the JVM + parquet footers once so per-query numbers measure the
    # plans, not first-touch JIT/IO setup.
    queries["q1_pricing_summary"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # Aggregated results are small → collect; wide results → count()
        # still executes the full plan.
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

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
