"""Phase timing + driver job-count census for the CurationState
lifecycle bench entries (t36/t44/t46) — VERDICT r11 Next #2.

These queries' wall time is dominated by sequential tiny driver jobs
(8c/32c scaling ratio ~1), so the first measurement is: how many Spark
jobs does each lifecycle op schedule, and which phase holds them.

Job counting reads DAGScheduler.nextJobId (a monotone AtomicInteger) —
delta across a region = jobs submitted in it. Phase timing wraps the
lifecycle methods. Run on an otherwise idle box:

    python scripts/lifecycle_job_count.py [t36|t44|t46|all] [--profile]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time


def _jobs(sc) -> int:
    return int(sc._jsc.sc().dagScheduler().numTotalJobs())


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    profile = "--profile" in sys.argv

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)

    from lp_etl_plugins_spark import incremental as INC
    from lp_etl_plugins_spark import inventory
    from lp_etl_plugins_spark.session import get_spark

    spark = get_spark("lifecycle-job-count", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm the JVM/parquet footers the same way bench.py does
    queries = inventory.all_queries()
    for warm in ("q1_pricing_summary", "j4_values_lookup"):
        queries[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(1).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # --actions: wrap every job-triggering DataFrame action and record
    # (engine call site, wall, job delta) — the driver-cadence map
    if "--actions" in sys.argv:
        import traceback

        # Spark 4: sessions hand out the classic subclass, which
        # OVERRIDES the action methods — patch it, not the base
        from pyspark.sql.classic.dataframe import DataFrame as _DF
        from pyspark.sql.readwriter import DataFrameWriter as _DW

        actions: list[tuple[str, str, float, int]] = []

        def _site() -> str:
            for fr in reversed(traceback.extract_stack()):
                if "lp_etl_plugins_spark" in fr.filename and "scripts" not in fr.filename:
                    return f"{fr.filename.rsplit('/', 1)[-1]}:{fr.lineno}"
            return "<inventory>"

        def _wrap_action(holder, nm):
            orig = getattr(holder, nm)

            def traced(*a, **kw):
                site, j0, t0 = _site(), _jobs(sc), time.perf_counter()
                out = orig(*a, **kw)
                actions.append(
                    (nm, site, time.perf_counter() - t0, _jobs(sc) - j0)
                )
                return out

            setattr(holder, nm, traced)

        for nm in ("collect", "count", "first", "localCheckpoint", "checkpoint"):
            _wrap_action(_DF, nm)
        for nm in ("parquet", "save"):
            _wrap_action(_DW, nm)
    else:
        actions = None

    # wrap the lifecycle methods with phase meters
    meters: list[tuple[str, float, int]] = []

    def _wrap(cls, name):
        orig = getattr(cls, name)

        def timed(*a, **kw):
            j0, t0 = _jobs(sc), time.perf_counter()
            out = orig(*a, **kw)
            meters.append((f"{cls.__name__}.{name}", time.perf_counter() - t0, _jobs(sc) - j0))
            return out

        setattr(cls, name, timed)

    for m in ("build", "_update_unfenced", "_retract_unfenced"):
        _wrap(INC.CurationState, m)
    import lp_etl_plugins_spark.textops as T

    for m in ("save", "update", "_append_saved_unfenced", "retract", "_retract_saved_unfenced"):
        _wrap(T.DedupIndex, m)

    targets = ["t36_incremental_curation", "t44_pipeline_retraction",
               "t46_asof_curation_manifest"] if which == "all" else {
        "t36": ["t36_incremental_curation"],
        "t44": ["t44_pipeline_retraction"],
        "t46": ["t46_asof_curation_manifest"],
    }[which]

    for name in targets:
        meters.clear()
        if actions is not None:
            actions.clear()
        fn = queries[name]
        j0, t0 = _jobs(sc), time.perf_counter()
        if profile:
            pr = cProfile.Profile()
            pr.enable()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        if profile:
            pr.disable()
        wall, jobs = time.perf_counter() - t0, _jobs(sc) - j0
        print(f"\n=== {name}: {wall:.2f}s, {jobs} driver jobs ===")
        for label, secs, nj in meters:
            print(f"  {label:45s} {secs:7.2f}s  {nj:4d} jobs")
        accounted = sum(s for _, s, _ in meters)
        print(f"  {'(outside wrapped methods)':45s} {wall - accounted:7.2f}s")
        if actions is not None:
            print("-- actions (>=0.05s), in execution order --")
            for nm, site, secs, nj in actions:
                if secs >= 0.05:
                    print(f"  {site:32s} {nm:16s} {secs:6.2f}s  {nj:3d} jobs")
            small = [a for a in actions if a[2] < 0.05]
            print(
                f"  (+{len(small)} actions under 0.05s, "
                f"{sum(a[2] for a in small):.2f}s, "
                f"{sum(a[3] for a in small)} jobs)"
            )
        if profile:
            st = pstats.Stats(pr)
            st.sort_stats("cumulative")
            print("-- top cumulative (engine frames) --")
            st.print_stats(r"lp_etl_plugins_spark", 30)
            st.dump_stats(f"/tmp/{name}.prof")


if __name__ == "__main__":
    main()
