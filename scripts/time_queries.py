"""Time a subset of inventory queries (isolated steady-state helper).

Usage: python scripts/time_queries.py t14_containment v2_knn_bucketed ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     REPS (default 2 — report the min, i.e. steady state after JIT warm).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    reps = int(os.environ.get("REPS", "2"))
    names = sys.argv[1:]

    from lp_etl_plugins_spark import inventory
    from lp_etl_plugins_spark.session import get_spark

    spark = get_spark("lp_etl_plugins_spark-timer", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = inventory.all_queries()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    for warm in ("q1_pricing_summary", "j4_values_lookup"):
        mat(queries[warm](spark, sf_dir))
    import pandas as pd  # noqa: F401

    mat(spark.range(1).mapInPandas(lambda it: it, "id long"))

    import gc

    out: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        out[name] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            mat(fn(spark, sf_dir))
            out[name].append(round(time.perf_counter() - t0, 3))
            gc.collect()
        print(f"# {name}: {out[name]} min={min(out[name]):.3f}", file=sys.stderr)
    print(json.dumps({k: {"runs": v, "min": min(v)} for k, v in out.items()}))


if __name__ == "__main__":
    main()
