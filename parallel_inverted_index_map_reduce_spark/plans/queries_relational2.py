"""Temporal join shapes the reference lacks entirely (SURVEY.md §2.1):
as-of join and range self-join, plus approximate aggregates (rows-only —
sketch internals differ per engine by design)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "asof_latest_order",
    oracle="""
WITH pairs AS (
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey, o.o_orderdate,
           row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
           ) AS rn
    FROM events e
    JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    WHERE e.event_id < 2000
)
SELECT event_id, user_id, ts, o_orderkey AS last_orderkey,
       o_orderdate AS last_orderdate
FROM pairs WHERE rn = 1
""",
    tags=("relational", "join", "asof"),
    doc="As-of join: each event matched to the user's latest order at or "
    "before the event time (window-deduped inequality join).",
)
def q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("event_id").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        e.join(
            o,
            (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_orderdate").alias("last_orderdate"),
        )
    )


@register(
    "range_join_event_bursts",
    oracle="""
SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
       CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_sec
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
""",
    tags=("relational", "join", "range"),
    doc="Range self-join: pairs of same-user events within a 5-minute "
    "burst window (equi key + bounded interval predicate).",
)
def q_range_join_event_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.select(
        F.col("event_id").alias("event_a"), "user_id", F.col("ts").alias("ts_a")
    )
    b = ev.select(
        F.col("event_id").alias("event_b"),
        F.col("user_id").alias("user_b"),
        F.col("ts").alias("ts_b"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_b"))
            & (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select(
            "event_a",
            "event_b",
            "user_id",
            (
                F.unix_timestamp("ts_b") - F.unix_timestamp("ts_a")
            ).alias("gap_sec"),
        )
    )


@register(
    "approx_aggregates",
    oracle=None,  # sketch algorithms (HLL/KLL) differ across engines by design;
    # exactness bounds asserted in tests instead.
    tags=("relational", "agg", "approx"),
    doc="Approximate distinct counts + percentiles (HyperLogLog / "
    "quantile sketch) — the 100 TB substitutes for exact distinct/sort.",
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        # serialized (scalar-typed) so any client canonicalizer digests it
        F.array_join(
            F.transform(
                F.percentile_approx(
                    "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), 10000
                ),
                lambda x: F.round(x, 6).cast("string"),
            ),
            " ",
        ).alias("price_quantiles"),
    )


@register(
    "skew_salted_sum",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(round(l_quantity, 6) AS DECIMAL(38,8))) AS VARCHAR)
           AS sum_qty
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("relational", "agg", "skew"),
    doc="Two-phase salted aggregation (operators/skew.py): hot keys fan "
    "out over 16 salted reducers, partials merge per key — result "
    "identical to the plain plan, proven through the oracle.",
)
def q_skew_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_sum

    l = _t(spark, sf_dir, "lineitem")
    return salted_sum(
        l,
        "l_returnflag",
        F.round("l_quantity", 6).cast("decimal(38,8)"),
        "sum_qty",
    ).withColumn("sum_qty", F.col("sum_qty").cast("string"))


# props_map_explode, datetime_format_functions and regexp_functions were
# folded into json_map_functions / date_functions / string_functions in
# queries_relational.py — same operators, one registry slot per family.


@register(
    "unpivot_lineitem_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, round(value, 6) AS value
FROM (
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
    FROM lineitem WHERE l_linenumber = 1
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_linenumber = 1
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax
    FROM lineitem WHERE l_linenumber = 1
)
""",
    tags=("relational", "reshape"),
    doc="Unpivot/melt: wide measure columns to long (measure, value) rows.",
)
def q_unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "value",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.regexp_replace("measure", "^l_", "").alias("measure"),
        F.round("value", 6).alias("value"),
    )


# window_value_functions was folded into queries_relational.py's
# window_navigation (one deterministic per-customer window serves the
# whole analytic family).
