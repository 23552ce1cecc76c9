"""Query inventory — the correctness surface of the engine.

Each submodule implements one operator family from SURVEY.md §2 and
exposes two dicts:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]`` — equivalent ANSI SQL for DuckDB over the
  same parquet tables (keys missing here get a rows-only check).

``__spark_entry__.py`` at the repo root aggregates these via
:func:`all_queries` / :func:`all_oracles`.

Determinism contract (so Spark and DuckDB hash-match):

- aggregates over doubles are rounded to the *conceptual decimal grid*
  of the data (TESTDATA money columns sit on a 0.01 grid, so sums are
  exact multiples of 0.01, products of two such columns of 0.0001, …);
  rounding to exactly that grid makes both engines land on the same
  double bit-pattern, while floating summation-order noise (~1e-9)
  stays far from any rounding boundary;
- averages/ratios are rounded to 6 places (arbitrary reals — boundary
  collision probability is negligible, unlike on-grid sums);
- every computed column is aliased identically in Spark and SQL;
- no query depends on session defaults (ANSI mode, timezone): casts
  that can fail use try_*, timestamps are compared/truncated, never
  formatted through locale.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

_MODULES = (
    "relational",
    "scalarfn",
    "graphops",
    "cubeops",
    "dcatops",
    "sourceops",
    "textops",
    "vectorops",
    "mediaops",
    "eventsops",
)


def _load() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod_name in _MODULES:
        mod = import_module(f"{__name__}.{mod_name}")
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLES", {})
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query keys across inventory modules: {dup}")
        queries.update(q)
        oracles.update(o)
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
