"""Scale-pattern proofs: bucketed joins plan without exchanges, salted
plans reproduce unsalted results."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators import bucketing, skew
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF_ORACLE, "orders")
    lineitem = load_table(spark, SF_ORACLE, "lineitem")
    bucketing.write_bucketed(orders, "b_orders", "o_orderkey", 8, "o_orderkey")
    bucketing.write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8, "l_orderkey")
    joined = bucketing.bucketed_join(
        spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey"
    )
    plan = _plan(joined)
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan
    # and it still computes the right row count
    expected = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
    )
    assert joined.count() == expected


def test_salted_sum_matches_plain(spark):
    l = load_table(spark, SF_ORACLE, "lineitem")
    plain = {
        r["l_returnflag"]: r["s"]
        for r in l.groupBy("l_returnflag")
        .agg(F.sum(F.round("l_quantity", 6).cast("decimal(38,8)")).alias("s"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: r["s"]
        for r in skew.salted_sum(
            l, "l_returnflag", F.round("l_quantity", 6).cast("decimal(38,8)"), "s"
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    l = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_ORACLE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = l.join(o, "l_orderkey").count()
    salted = skew.salted_join_small(l, o, "l_orderkey").count()
    assert plain == salted
