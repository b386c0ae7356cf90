"""Local re-implementation of the driver's DuckDB-oracle comparison.

Mirrors the contract in /root/repo/__spark_entry__.py: run the Spark
query and the oracle SQL side by side, then compare row count, sorted
column names, and order-insensitive values. Catching a mismatch here at
sf0.001 is much cheaper than waiting for the driver's sf0.01 run.
"""

from __future__ import annotations

import math

import duckdb

from parallel_inverted_index_map_reduce_spark.sources.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for name in TABLE_NAMES:
        conn.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return conn


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip repr keeps full precision; equality must be exact
        # because the driver hashes raw values.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_norm_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return _norm_cell(v.item())
    except ImportError:
        pass
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(normed, key=repr)


def compare(spark_df, conn, sql: str, name: str = "query") -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = conn.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}")

    sc, sn = _norm_rows(s_cols, s_rows)
    dc, dn = _norm_rows(d_cols, d_rows)
    if sn != dn:
        diffs = 0
        for i, (a, b) in enumerate(zip(sn, dn)):
            if a != b:
                if diffs < 3:
                    problems.append(f"{name}: row {i} differs\n  spark ={a}\n  duckdb={b}")
                diffs += 1
        if diffs:
            problems.append(f"{name}: {diffs} differing rows (cols {sc})")
        elif len(sn) != len(dn):
            tail = sn[len(dn) :] if len(sn) > len(dn) else dn[len(sn) :]
            problems.append(f"{name}: extra rows: {tail[:3]}")
    return problems
