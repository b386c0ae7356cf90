"""Cross-engine-stable aggregate expression helpers.

Double addition is not associative, so a plain ``sum(double)`` differs
in the last ulps between Spark (partition-parallel reduction) and any
other engine — and between two Spark runs with different partitioning.
Summing as decimal makes the reduction exact and order-independent.

Three measured cross-engine pitfalls shape the pattern (verified
row-by-row on sf0.1, 600k rows):
- Spark's double->decimal cast goes through the double's shortest decimal
  representation (java BigDecimal.valueOf) while DuckDB converts the
  exact binary value. Pre-rounding the double at 6 decimals makes the
  per-row decimals bit-identical in both engines.
- DuckDB's decimal->double cast is NOT correctly rounded (int128/10^k in
  float arithmetic, observed 1 ulp off), while Spark's is. So the stable
  aggregate never casts back to double.
- The two engines materialize DECIMAL differently client-side (Spark
  toPandas -> decimal.Decimal objects; DuckDB -> float64), so equal
  values hash differently in a pandas-level comparison. The final
  output column is therefore the decimal rendered as a STRING — both
  engines print fixed-scale decimals identically ("1.50000000",
  "-2.25000000", "0.00000000"; verified value-by-value including
  negative-zero rounding), so the client sees the same object either
  way.

Internally the math stays decimal(38,8) for sums and decimal(18,6) for
averages — exact, deterministic under any partitioning; only the final
projection is a string.

String-input contract: every builder here that accepts ``Column | str``
treats the STRING as a Spark-SQL *expression* interpolated verbatim
into one ``F.expr`` parse (the one-parse hot path) — it is NOT a column
name. Identifiers that need quoting must arrive pre-backticked, and the
string form is for TRUSTED INTERNAL call sites only (registry query
builders passing literal expression text); never route user-supplied
strings through it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,8)"


def _micros(col: Column) -> Column:
    """Per-row value scaled to integer micros, in pure codegen arithmetic.

    ``floor(x*1e6 + 0.5)`` equals ``round(x, 6) * 1e6`` whenever the
    value's true decimal expansion has <= 6 places and the double
    representation error is far below 0.5 micros — true for every
    measure column in the engine's data model (prices/discounts/taxes
    carry <= 2 places, their pairwise products <= 6; measured max
    |x*1e6 - nearest_int| is 3e-5 across all tables at sf0.1). Unlike
    ``F.round`` (a per-row java BigDecimal round-trip), this stays in
    whole-stage codegen as primitive double/long ops — measured 2.7x
    faster on the TPC-H Q1 aggregate.
    """
    return F.floor(col * F.lit(1_000_000.0) + F.lit(0.5))


def _sql_micros_spark(e: str) -> str:
    return f"FLOOR(({e}) * 1000000.0D + 0.5D)"


def _sql_dsum_dec_spark(e: str) -> str:
    """The Spark-SQL text twin of :func:`dsum_dec` (same expression tree
    — ``sameSemantics`` with the Column form is pinned by
    tests/test_dsum_properties.py). Accepting the input as SQL text
    cuts the builder from ~130 py4j round trips (~30 ms of driver wall
    per aggregate, measured) to one ``F.expr`` parse (~3 ms): at bench
    scale the TPC-H Q1 build spent more time chatting with the JVM
    than the query spent executing."""
    m = _sql_micros_spark(e)
    lo = f"pmod({m}, 1000000)"
    q = f"CAST((({m}) - ({lo})) / 1000000 AS BIGINT)"
    mid = f"pmod({q}, 1000000)"
    hi = f"CAST((({q}) - ({mid})) / 1000000 AS BIGINT)"
    total = (
        f"CAST(SUM({hi}) AS DECIMAL(38,0)) * 1000000000000"
        f" + CAST(SUM({mid}) AS DECIMAL(38,0)) * 1000000"
        f" + CAST(SUM({lo}) AS DECIMAL(38,0))"
    )
    return f"CAST(({total}) / 1000000 AS {DEC})"


def dsum_dec(col: Column | str) -> Column:
    """The internal decimal sum (exact, order-independent). Use this when
    the result feeds further computation (HAVING, ratios); render with
    ``as_str`` in the final projection.

    Implementation: radix-split long sums. The per-row long micros are
    split into three base-1e6 digits (lo, mid, hi — pmod keeps lo/mid in
    [0, 1e6) for any sign), each digit is summed as a plain LONG — the
    aggregation hot path stays entirely on primitive longs in
    whole-stage codegen, no Decimal objects — and the three totals are
    recombined exactly in decimal AFTER aggregation (one expression per
    group, not per row). Measured 1.7x faster than summing
    decimal(30,0) micros on the TPC-H Q1 aggregate, bit-identical
    output.

    Overflow analysis: lo/mid digits are < 1e6, so their long sums wrap
    only past ~9.2e12 rows PER GROUP; the hi digit is ~value/1e12 —
    nonzero only for per-row values >= 1e6 units. Per-row magnitude is
    bounded by _micros' own 2^53 constraint (|value| <= ~9e9 units), so
    the split adds no new limit. The decimal recombination
    (hi*1e12 + mid*1e6 + lo) / 1e6 is exact: every quantity has <= 6
    decimal places by construction.

    ``col`` may be a Column or a Spark-SQL expression string; the
    string form builds the identical tree through one ``F.expr`` parse
    (see :func:`_sql_dsum_dec_spark`) — pass strings on query-build
    hot paths.
    """
    if isinstance(col, str):
        return F.expr(_sql_dsum_dec_spark(col))
    m = _micros(col)
    lo = F.pmod(m, F.lit(1_000_000))
    # (m - lo) is an exact multiple of 1e6 and |m| < 2^53, so the double
    # division is exact; cast back to long for the digit sums.
    q = ((m - lo) / F.lit(1_000_000)).cast("long")
    mid = F.pmod(q, F.lit(1_000_000))
    hi = ((q - mid) / F.lit(1_000_000)).cast("long")
    total = (
        F.sum(hi).cast("decimal(38,0)") * F.lit(1_000_000_000_000)
        + F.sum(mid).cast("decimal(38,0)") * F.lit(1_000_000)
        + F.sum(lo).cast("decimal(38,0)")
    )
    return (total / F.lit(1_000_000)).cast(DEC)


def as_str(col: Column) -> Column:
    """Render a decimal result as its fixed-scale string (the only
    client-visible type that materializes identically in both engines)."""
    return col.cast("string")


def dsum(col: Column | str, alias: str) -> Column:
    """Order-stable, cross-engine-stable sum of a double expression.
    String input takes the one-parse build path (see dsum_dec)."""
    if isinstance(col, str):
        return F.expr(f"CAST({_sql_dsum_dec_spark(col)} AS STRING)").alias(alias)
    return dsum_dec(col).cast("string").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-stable average: exact decimal sum / non-null count, rounded.
    String input takes the one-parse build path (see dsum_dec)."""
    if isinstance(col, str):
        return F.expr(
            f"CAST(CAST(ROUND(({_sql_dsum_dec_spark(col)}) / COUNT({col}), 6)"
            " AS DECIMAL(18,6)) AS STRING)"
        ).alias(alias)
    return (
        F.round(dsum_dec(col) / F.count(col), 6)
        .cast("decimal(18,6)")
        .cast("string")
        .alias(alias)
    )


def sql_dsum_dec(expr: str) -> str:
    return f"SUM(CAST(round({expr}, 6) AS DECIMAL(38,8)))"


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST({sql_dsum_dec(expr)} AS VARCHAR) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(CAST(round({sql_dsum_dec(expr)}"
        f" / COUNT({expr}), 6) AS DECIMAL(18,6)) AS VARCHAR) AS {alias}"
    )


def stable_round6(col: Column | str) -> Column:
    """Cross-engine round-to-6 for ratio-valued doubles, as a string.

    Ratios of small integers land on exact decimal ties (e.g. x/32 =
    0.2569375) where Spark (shortest-string half-up) and DuckDB
    (exact-binary) round(…, 6) disagree; casting through a high-scale
    decimal first absorbs the binary error so both engines round the
    same decimal half-up. The final string cast keeps the client-side
    representation identical too (see module docstring).
    """
    if isinstance(col, str):
        return F.expr(
            f"CAST(CAST(ROUND(CAST(({col}) AS DECIMAL(28,12)), 6)"
            " AS DECIMAL(18,6)) AS STRING)"
        )
    return F.round(col.cast("decimal(28,12)"), 6).cast("decimal(18,6)").cast("string")


def sql_stable_round6(expr: str) -> str:
    return (
        f"CAST(CAST(round(CAST({expr} AS DECIMAL(28,12)), 6)"
        " AS DECIMAL(18,6)) AS VARCHAR)"
    )
