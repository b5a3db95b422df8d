"""DuckDB oracle harness — in-repo rehearsal of the driver's gate.

The driver runs each registered Spark query and its oracle SQL
side-by-side at sf0.01 and compares row count + schema + order-
insensitive value hash. This module reproduces that comparison locally
(strictly: exact values after canonical sorting) so every query is
validated BEFORE the driver sees it.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

from mapreduce_implementation_spark.sources.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with every testdata table registered as a view
    (mirrors the driver's pre-registered views)."""
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb_connect(sf_dir)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def canonicalize(df: pd.DataFrame, float_decimals: int | None = None) -> pd.DataFrame:
    """Sort columns by name, normalize cell values to plain python
    objects, sort rows — the order-insensitive canonical form."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: _canon_value(v, float_decimals))
    out = out.sort_values(by=list(out.columns), key=lambda s: s.map(repr)).reset_index(drop=True)
    return out


def _canon_value(v, float_decimals: int | None):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if float_decimals is not None:
            return round(v, float_decimals)
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x, float_decimals) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _canon_value(v.item(), float_decimals)
        if isinstance(v, np.ndarray):
            return tuple(_canon_value(x, float_decimals) for x in v.tolist())
    except ImportError:
        pass
    return v


@dataclass
class Mismatch:
    kind: str
    detail: str

    def __str__(self) -> str:  # pragma: no cover
        return f"{self.kind}: {self.detail}"


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, float_decimals: int | None = None) -> list[Mismatch]:
    """Compare two result frames the way the driver does. Returns a list
    of mismatches (empty = pass)."""
    problems: list[Mismatch] = []
    if len(spark_df) != len(oracle_df):
        problems.append(Mismatch("rowcount", f"spark={len(spark_df)} oracle={len(oracle_df)}"))
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        problems.append(Mismatch("schema", f"spark={s_cols} oracle={o_cols}"))
        return problems
    if problems:
        return problems
    a = canonicalize(spark_df, float_decimals)
    b = canonicalize(oracle_df, float_decimals)
    neq = a.compare(b) if a.shape == b.shape else None
    if neq is None or not neq.empty:
        # Build a small diff sample for debugging.
        diffs = []
        for i in range(min(len(a), len(b))):
            ra, rb = tuple(a.iloc[i]), tuple(b.iloc[i])
            if ra != rb:
                diffs.append(f"row{i}: spark={ra!r} oracle={rb!r}")
            if len(diffs) >= 5:
                break
        if diffs:
            problems.append(Mismatch("values", "; ".join(diffs)))
    return problems
