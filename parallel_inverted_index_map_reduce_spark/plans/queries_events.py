"""Event-analytics composites over the events table: funnel, DAU,
cohort retention — the multi-operator shapes (conditional aggregation,
self-joins on time arithmetic, distinct-by-day) that a production
pipeline layers on the primitives the other modules cover one by one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "event_funnel",
    oracle="""
WITH m AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
    FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       count(*) FILTER (WHERE t_view IS NOT NULL) AS viewed,
       count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view)
           AS clicked_after_view,
       count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                        AND t_buy > t_click) AS purchased_after_click
FROM m
""",
    tags=("events", "funnel"),
    doc="First-touch funnel: first view < first click < first purchase "
    "per user, counted per stage (one aggregation, no self-joins).",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    m = e.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_buy"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_buy") > F.col("t_click"))
    return m.agg(
        F.count("*").alias("n_users"),
        F.count(F.when(viewed, 1)).alias("viewed"),
        F.count(F.when(clicked, 1)).alias("clicked_after_view"),
        F.count(F.when(bought, 1)).alias("purchased_after_click"),
    )


@register(
    "dau_retention",
    oracle="""
WITH du AS (
    SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
    FROM events
),
dau AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(DISTINCT user_id) AS dau,
           count(*) AS n_events
    FROM events GROUP BY 1
),
ret AS (
    SELECT a.day, count(b.user_id) AS retained_next_day
    FROM du a
    LEFT JOIN du b
      ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
    GROUP BY a.day
)
SELECT d.day, d.dau, d.n_events, r.retained_next_day
FROM dau d JOIN ret r ON r.day = d.day
""",
    tags=("events", "agg", "join"),
    doc="Daily active users + day-over-day cohort retention in one "
    "day-keyed result: distinct-count per calendar day joined with the "
    "(user, day+1) self-join of per-day distinct users.",
)
def q_dau_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    dau = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count("*").alias("n_events"),
    )
    du = e.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct()
    b = du.select(
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("user_id").alias("user_b"),
    )
    ret = (
        du.join(b, (du.user_id == b.user_b) & (du.day == b.day), "left")
        .groupBy(du.day.alias("day"))
        .agg(F.count("user_b").alias("retained_next_day"))
    )
    return dau.join(ret, "day")
