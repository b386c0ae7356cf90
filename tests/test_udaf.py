"""GROUPED_AGG pandas UDAF equals its built-in-expression oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.functions.udaf import (
    geometric_mean_expr,
    geometric_mean_udaf,
)
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def test_grouped_agg_udaf_matches_builtin(spark):
    o = load_table(spark, SF_ORACLE, "orders")
    geo = geometric_mean_udaf()
    got = (
        o.groupBy("o_orderstatus")
        .agg(geo("o_totalprice").alias("g"))
        .collect()
    )
    want = {
        r.o_orderstatus: r.g
        for r in o.groupBy("o_orderstatus")
        .agg(geometric_mean_expr(F.col("o_totalprice")).alias("g"))
        .collect()
    }
    assert len(got) > 0
    for r in got:
        assert abs(r.g - want[r.o_orderstatus]) / want[r.o_orderstatus] < 1e-9
