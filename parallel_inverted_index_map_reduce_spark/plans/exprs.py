"""Cross-engine-stable aggregate expression helpers.

Double addition is not associative, so a plain ``sum(double)`` differs
in the last ulps between Spark (partition-parallel reduction) and any
other engine — and between two Spark runs with different partitioning.
Summing as decimal makes the reduction exact and order-independent.

Two measured cross-engine pitfalls shape the pattern (verified row-by-row
on sf0.1, 600k rows):
- Spark's double->decimal cast goes through the double's shortest decimal
  representation (java BigDecimal.valueOf) while DuckDB converts the
  exact binary value. Pre-rounding the double at 6 decimals makes the
  per-row decimals bit-identical in both engines.
- DuckDB's decimal->double cast is NOT correctly rounded (int128/10^k in
  float arithmetic, observed 1 ulp off), while Spark's is. So the stable
  aggregate keeps the DECIMAL as the result type instead of casting back.

The result column is decimal(38,8) for sums and decimal(18,6) for
averages — exact, deterministic under any partitioning, and identical
in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,8)"


def dsum(col: Column, alias: str) -> Column:
    """Order-stable, cross-engine-stable sum of a double expression."""
    return F.sum(F.round(col, 6).cast(DEC)).alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order-stable average: exact decimal sum / non-null count, rounded."""
    return (
        F.round(F.sum(F.round(col, 6).cast(DEC)) / F.count(col), 6)
        .cast("decimal(18,6)")
        .alias(alias)
    )


def sql_dsum(expr: str, alias: str) -> str:
    return f"SUM(CAST(round({expr}, 6) AS DECIMAL(38,8))) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(round(SUM(CAST(round({expr}, 6) AS DECIMAL(38,8)))"
        f" / COUNT({expr}), 6) AS DECIMAL(18,6)) AS {alias}"
    )


def stable_round6(col: Column) -> Column:
    """Cross-engine round-to-6 for ratio-valued doubles.

    Ratios of small integers land on exact decimal ties (e.g. x/32 =
    0.2569375) where Spark (shortest-string half-up) and DuckDB
    (exact-binary) round(…, 6) disagree; casting through a high-scale
    decimal first absorbs the binary error so both engines round the
    same decimal half-up.
    """
    return F.round(col.cast("decimal(28,12)"), 6).cast("decimal(18,6)")


def sql_stable_round6(expr: str) -> str:
    return f"CAST(round(CAST({expr} AS DECIMAL(28,12)), 6) AS DECIMAL(18,6))"
