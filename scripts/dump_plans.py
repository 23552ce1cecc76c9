"""Dump .explain('formatted') for every inventory query + a plan-shape
summary (exchange count, join strategies, Python-eval nodes, scans with
pushed filters) — the round-12 per-query optimization audit's evidence
base (guide §7.2).

Usage: python scripts/dump_plans.py [outdir] [name ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.

Lifecycle entries execute their state construction when the DataFrame
is built (explain itself is pure planning); session-shared substrates
are built once and reused, exactly as in the bench.
"""

from __future__ import annotations

import os
import re
import sys


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r12"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)

    from lp_etl_plugins_spark import inventory
    from lp_etl_plugins_spark.session import get_spark

    spark = get_spark("plan-dump", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    queries = inventory.all_queries()
    names = sorted(only or queries)

    summary = []
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — audit must not die mid-sweep
            summary.append((name, f"ERROR {type(exc).__name__}: {exc}"))
            continue
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(
            r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)\b", plan)))
        py = sorted(set(re.findall(
            r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
            r"FlatMapGroupsInPandas)\b", plan)))
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        scans = len(re.findall(r"Scan parquet", plan))
        summary.append((
            name,
            f"exch={n_ex} scans={scans} pushed={pushed} "
            f"joins={','.join(joins) or '-'} py={','.join(py) or '-'}",
        ))
        print(f"# {name}: {summary[-1][1]}", file=sys.stderr)
    with open(os.path.join(outdir, "SUMMARY.tsv"), "w") as fh:
        for name, line in summary:
            fh.write(f"{name}\t{line}\n")


if __name__ == "__main__":
    main()
