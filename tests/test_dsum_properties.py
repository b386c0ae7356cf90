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
