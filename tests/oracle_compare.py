"""Local re-implementation of the driver's DuckDB-oracle comparison.

Mirrors the contract in /root/repo/__spark_entry__.py: run the Spark
query and the oracle SQL side by side, then compare row count, sorted
column names, and order-insensitive values. Catching a mismatch here at
sf0.001 is much cheaper than waiting for the driver's sf0.01 run.

Round-1 lesson (CORRECTNESS_r01.json): the driver canonicalizes BOTH
sides through pandas (``sort_values`` over every column, then a value
hash), so two failure classes exist that a collect()-based comparison
cannot see:

- list-valued cells (ArrayType columns) are unhashable -> the driver
  errors before comparing anything;
- decimal-valued cells materialize as ``decimal.Decimal`` from Spark's
  toPandas but ``float64`` from DuckDB -> equal values, different
  objects, hash mismatch.

This harness therefore compares *pandas* frames exactly like the driver
and additionally rejects any Decimal / list / ndarray cell outright, so
a locally-green spec cannot hit either driver failure class.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import numpy as np
import pandas as pd

from parallel_inverted_index_map_reduce_spark.sources.tables import TABLE_NAMES

# Cell types the driver's canonicalizer cannot digest: lists/arrays crash
# pandas sort_values; Decimal hashes differently from DuckDB's float64.
_FORBIDDEN = (decimal.Decimal, list, tuple, np.ndarray, dict)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for name in TABLE_NAMES:
        conn.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return conn


def _forbidden_cells(df: pd.DataFrame, side: str, name: str) -> list[str]:
    problems = []
    for col in df.columns:
        if df[col].dtype == object:
            bad = df[col].map(lambda v: isinstance(v, _FORBIDDEN)).any()
            if bad:
                sample = next(
                    v for v in df[col] if isinstance(v, _FORBIDDEN)
                )
                problems.append(
                    f"{name}: {side} column {col!r} holds "
                    f"{type(sample).__name__} cells (driver-canonicalizer "
                    f"hazard) e.g. {sample!r}"
                )
    return problems


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip repr keeps full precision; equality must be exact
        # because the driver hashes raw values.
        return repr(v)
    if isinstance(v, np.generic):
        return _norm_cell(v.item())
    if isinstance(v, pd.Timestamp):
        # Spark yields tz-aware UTC stamps, DuckDB naive ones; the values
        # are the same instant (session tz is UTC) and the driver's r01
        # results show these hash equal — normalize to naive.
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def _canon(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


def compare(spark_df, conn, sql: str, name: str = "query") -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_pd = spark_df.toPandas()
    d_pd = conn.sql(sql).df()

    problems += _forbidden_cells(s_pd, "spark", name)
    problems += _forbidden_cells(d_pd, "duckdb", name)
    if problems:
        return problems

    if sorted(s_pd.columns) != sorted(d_pd.columns):
        problems.append(
            f"{name}: columns differ spark={sorted(s_pd.columns)} "
            f"duckdb={sorted(d_pd.columns)}"
        )
        return problems
    if len(s_pd) != len(d_pd):
        problems.append(
            f"{name}: row count spark={len(s_pd)} duckdb={len(d_pd)}"
        )

    sc, sn = _canon(s_pd)
    dc, dn = _canon(d_pd)
    if sn != dn:
        # multiset difference, not positional zip: one extra early-sorting
        # row would misalign every later pair and report bogus diffs
        from collections import Counter

        s_only = Counter(sn) - Counter(dn)
        d_only = Counter(dn) - Counter(sn)
        for label, extra in (("spark-only", s_only), ("duckdb-only", d_only)):
            for row in list(extra.elements())[:3]:
                problems.append(f"{name}: {label} row {row}")
        problems.append(
            f"{name}: {sum(s_only.values())} spark-only / "
            f"{sum(d_only.values())} duckdb-only rows (cols {sc})"
        )
    return problems
