"""Oracle-parity harness mirroring the driver's correctness check.

Runs a Spark inventory query and its DuckDB oracle SQL on the same
parquet tables, sorts columns by name and rows by value, and compares
cell-by-cell with EXACT equality (floats must match bit-for-bit — the
inventory's rounding contract guarantees that when the query is right).
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from dataclasses import dataclass, field

import duckdb
import numpy as _np
import pandas as pd
from pyspark.sql import SparkSession

from .tables import TABLE_NAMES


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)

    def __str__(self) -> str:  # pragma: no cover
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for p in self.problems[:5]:
            msg += f"\n    - {p}"
        return msg


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonicalize cells to hashable/sortable primitives
    def canon(v):
        if v is None:
            return "<NULL>"
        # np.floating covers float32 (Spark FloatType) — a plain
        # `isinstance(v, float)` would let a float32 NaN fall through
        # to the pd.isna fallback and alias it with "<NULL>"
        if isinstance(v, (float, _np.floating)):
            v = float(v)
            if math.isnan(v):
                # Distinct from "<NULL>": a query returning NaN where the
                # oracle returns NULL is a semantic divergence and must
                # fail locally (the driver's hash check would catch it).
                return "<NaN>"
            return repr(v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(str(canon(x)) for x in v) + "]"
        if isinstance(v, pd.Timestamp):
            if pd.isna(v):
                return "<NULL>"
            return v.isoformat()
        # DuckDB DATE arrives as pd.Timestamp (midnight) while Spark
        # DateType arrives as datetime.date — canonicalize both to the
        # same midnight isoformat so raw-date columns don't spuriously
        # mismatch (datetime.datetime already isoformats identically)
        if isinstance(v, _dt.datetime):
            return v.isoformat()
        if isinstance(v, _dt.date):
            return pd.Timestamp(v).isoformat()
        if pd.isna(v) if not isinstance(v, (str, bytes)) else False:
            return "<NULL>"
        return str(v)

    out = df.map(canon)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def check_parity(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    query,
    oracle: str | None,
) -> ParityResult:
    sdf = query(spark, sf_dir).toPandas()
    if oracle is None:
        # mirrors the driver's weaker rows-only contract: success =
        # the query executed (reaching this line); emptiness is legal
        return ParityResult(name, True, len(sdf), -1, ["rows-only check (no oracle)"])
    con = duckdb_connection(sf_dir)
    try:
        odf = con.execute(oracle).df()
    finally:
        con.close()
    problems: list[str] = []
    if len(sdf) != len(odf):
        problems.append(f"row count mismatch: spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
    if not problems:
        a, b = _normalize(sdf), _normalize(odf)
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            for i in a.index[neq][:3]:
                problems.append(f"row {i}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}")
    return ParityResult(name, not problems, len(sdf), len(odf), problems)


def run_all(spark: SparkSession, sf_dir: str, only: list[str] | None = None) -> list[ParityResult]:
    from . import inventory

    queries = inventory.all_queries()
    oracles = inventory.all_oracles()
    results = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            results.append(check_parity(spark, sf_dir, name, fn, oracles.get(name)))
        except Exception as exc:  # pragma: no cover
            results.append(ParityResult(name, False, -1, -1, [f"exception: {exc!r:.500}"]))
    return results
