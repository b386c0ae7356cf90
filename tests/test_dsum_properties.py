"""Property tests for the radix-split exact decimal sum.

dsum_dec is the engine's core numeric helper (every money aggregate
rides it); these properties pin the two claims its docstring makes:
exactness (equals the Decimal-arithmetic ground truth at 6-decimal
inputs, including negatives and sign cancellation) and partition-order
independence (any repartitioning yields the identical string).
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.plans.exprs import dsum

# 6-decimal-place values in the documented magnitude envelope,
# mixed signs, with heavy duplication to force carry paths
micros = st.integers(min_value=-10_000_000_000, max_value=10_000_000_000)
value_lists = st.lists(micros, min_size=1, max_size=60)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ms=value_lists)
def test_dsum_exact_and_partition_independent(spark, ms):
    vals = [m / 1_000_000.0 for m in ms]  # exact 6-decimal doubles
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = df.agg(dsum(F.col("x"), "s")).first().s
    want = sum(Decimal(m) for m in ms) / Decimal(1_000_000)
    assert Decimal(got) == want.quantize(Decimal("1.00000000"))

    got13 = df.repartition(13).agg(dsum(F.col("x"), "s")).first().s
    got1 = df.coalesce(1).agg(dsum(F.col("x"), "s")).first().s
    assert got13 == got and got1 == got


def test_string_form_same_semantics(spark):
    """The SQL-text builders (one F.expr parse) produce the identical
    Catalyst tree as the Column builders — sameSemantics, not just equal
    rows — so swapping call sites to strings cannot change any result."""
    from parallel_inverted_index_map_reduce_spark.plans.exprs import (
        davg,
        dsum_dec,
        stable_round6,
    )

    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    disc_c = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    disc_s = "l_extendedprice * (1 - l_discount)"
    charge_c = disc_c * (1 + F.col("l_tax"))
    charge_s = f"({disc_s}) * (1 + l_tax)"
    a = l.groupBy("l_returnflag").agg(
        dsum(F.col("l_quantity"), "s1"),
        dsum(disc_c, "s2"),
        dsum(charge_c, "s3"),
        davg(F.col("l_discount"), "a1"),
        dsum_dec(F.col("l_quantity")).alias("d1"),
    )
    b = l.groupBy("l_returnflag").agg(
        dsum("l_quantity", "s1"),
        dsum(disc_s, "s2"),
        dsum(charge_s, "s3"),
        davg("l_discount", "a1"),
        dsum_dec("l_quantity").alias("d1"),
    )
    assert a.schema == b.schema
    assert a.sameSemantics(b)

    r1 = l.select(stable_round6(F.col("l_discount") / F.col("l_quantity")).alias("r"))
    r2 = l.select(stable_round6("l_discount / l_quantity").alias("r"))
    assert r1.sameSemantics(r2)
