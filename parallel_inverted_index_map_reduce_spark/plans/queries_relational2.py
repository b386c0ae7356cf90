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
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias(
            "price_quantiles"
        ),
    )


@register(
    "skew_salted_sum",
    oracle="""
SELECT l_returnflag,
       SUM(CAST(round(l_quantity, 6) AS DECIMAL(38,8))) AS sum_qty
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
    )


@register(
    "props_map_explode",
    oracle="""
SELECT event_id, 'k' AS map_key,
       CAST(json_extract(props, '$.k') AS BIGINT) AS map_value
FROM events
WHERE props IS NOT NULL
""",
    tags=("relational", "functions", "map"),
    doc="Map family: parse the JSON props into map<string,long> and "
    "explode entries (generic on the Spark side; the oracle exploits "
    "the fixture's single known key).",
)
def q_props_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.where(F.col("props").isNotNull())
        .select(
            "event_id",
            F.explode(F.from_json("props", "map<string,bigint>")).alias(
                "map_key", "map_value"
            ),
        )
    )


@register(
    "datetime_format_functions",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m') AS ym,
       CAST(extract(dow FROM o_orderdate) + 1 AS BIGINT) AS dow,
       CAST(extract(week FROM o_orderdate) AS BIGINT) AS iso_week,
       CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
FROM orders
WHERE o_orderkey % 100 = 0
""",
    tags=("relational", "functions", "date"),
    doc="Datetime formatting family: pattern format, day-of-week, ISO "
    "week, quarter, epoch seconds.",
)
def q_datetime_format_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.dayofweek("o_orderdate").cast("long").alias("dow"),
            F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.unix_timestamp("o_orderdate").alias("epoch_sec"),
        )
    )


@register(
    "regexp_functions",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '^(\\w+) (\\w+)$', 1) AS adjective,
       regexp_extract(p_name, '^(\\w+) (\\w+)$', 2) AS noun,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part
WHERE regexp_matches(p_name, 'widget|gizmo')
""",
    tags=("relational", "functions", "regexp"),
    doc="Regexp family: group extraction, global replace, pattern filter.",
)
def q_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    pat = r"^(\w+) (\w+)$"
    return (
        p.where(F.col("p_name").rlike("widget|gizmo"))
        .select(
            "p_partkey",
            F.regexp_extract("p_name", pat, 1).alias("adjective"),
            F.regexp_extract("p_name", pat, 2).alias("noun"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        )
    )


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


@register(
    "window_value_functions",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS last_order,
       nth_value(o_orderkey, 2) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_order,
       CAST(round(CAST(percent_rank() OVER w AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS pct_rank,
       CAST(round(CAST(cume_dist() OVER w AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("relational", "window"),
    doc="Window value/distribution family: first/last/nth value, "
    "percent_rank, cume_dist over deterministic ordering.",
)
def q_window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    from .exprs import stable_round6 as _stable6

    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
        _stable6(F.percent_rank().over(w)).alias("pct_rank"),
        _stable6(F.cume_dist().over(w)).alias("cume"),
    )
