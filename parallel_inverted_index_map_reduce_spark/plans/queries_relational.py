"""Relational operator coverage over the TPC-H-ish tables
(SURVEY.md §2.1 gap list + §7 Phase 3): joins of every flavor,
aggregation variants (rollup/cube/grouping sets), window functions,
set operations, top-k, and the scalar function families.

Scale notes baked into each plan:
- dimension tables (region/nation/customer/supplier/part) join via
  ``F.broadcast`` — at 100 TB these stay small relative to the fact
  tables, so no shuffle on the big side;
- fact-fact joins (orders-lineitem) shuffle on the join key; AQE
  handles skew; filters sit before joins so Catalyst pushes them into
  the parquet scan;
- double aggregates use the decimal-sum pattern from plans/exprs.py so
  results are partition-order independent (a correctness property at
  1000 executors, not just an oracle trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .exprs import davg, dsum, sql_davg, sql_dsum
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- aggregation -----------------------------------------------------------


@register(
    "pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("relational", "agg"),
    bench=True,
    doc="TPC-H Q1 shape: wide aggregate with pushed-down date filter.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "rollup_orders",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       SUM(CAST(round(o_totalprice, 6) AS DECIMAL(38,8))) AS total_price,
       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    tags=("relational", "agg"),
    doc="Hierarchical subtotals via ROLLUP with grouping indicators.",
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice"), "total_price"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
    )


@register(
    "cube_lineitem",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       SUM(CAST(round(l_quantity, 6) AS DECIMAL(38,8))) AS sum_qty,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_status
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("relational", "agg"),
    doc="All grouping combinations via CUBE.",
)
def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        dsum(F.col("l_quantity"), "sum_qty"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


@register(
    "grouping_sets_events",
    oracle="""
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(*) AS n_events,
       SUM(CAST(round(value, 6) AS DECIMAL(38,8))) AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type), (day), ())
""",
    tags=("relational", "agg"),
    doc="Explicit GROUPING SETS (by type, by day, grand total).",
)
def q_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("gs_events")
    return spark.sql(
        """
        SELECT event_type, date_trunc('day', ts) AS day,
               count(*) AS n_events,
               SUM(CAST(round(value, 6) AS DECIMAL(38,8))) AS sum_value
        FROM gs_events
        GROUP BY GROUPING SETS ((event_type), (day), ())
        """
    )


@register(
    "having_filter",
    oracle="""
SELECT o_custkey, count(*) AS n_orders,
       SUM(CAST(round(o_totalprice, 6) AS DECIMAL(38,8))) AS spend
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 12
""",
    tags=("relational", "agg"),
    doc="Post-aggregation filter (HAVING).",
)
def q_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum(F.col("o_totalprice"), "spend"))
        .where(F.col("n_orders") >= 12)
    )


@register(
    "distinct_counts",
    oracle="""
SELECT count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
""",
    tags=("relational", "agg"),
    doc="Multiple exact distinct counts in one aggregate (expand-based).",
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# --- joins -----------------------------------------------------------------


@register(
    "shipping_priority",
    oracle="""
WITH rev AS (
    SELECT l.l_orderkey,
           SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6) AS DECIMAL(38,8))) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
)
SELECT l_orderkey, revenue, o_orderdate,
       row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS "rank"
FROM rev
QUALIFY "rank" <= 10
""",
    tags=("relational", "join"),
    bench=True,
    doc="TPC-H Q3 shape: 3-way join + agg + deterministic top-10.",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .select("l_orderkey", "revenue", "o_orderdate", "rank")
    )


@register(
    "local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6) AS DECIMAL(38,8))) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
    tags=("relational", "join"),
    bench=True,
    doc="TPC-H Q5 shape: 6-way join, dims broadcast, facts shuffled on keys.",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    dims = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    cust = c.join(F.broadcast(dims), c.c_nationkey == dims.n_nationkey).select(
        "c_custkey", "c_nationkey"
    )
    supp = s.join(F.broadcast(dims), s.s_nationkey == dims.n_nationkey).select(
        "s_suppkey", "s_nationkey"
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), l.l_suppkey == supp.s_suppkey)
        .where(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(dims), F.col("c_nationkey") == dims.n_nationkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


@register(
    "semi_join_customers",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
    tags=("relational", "join"),
    doc="Left-semi join (EXISTS): customers with at least one urgent order.",
)
def q_semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "anti_join_customers",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
)
""",
    tags=("relational", "join"),
    doc="Left-anti join (NOT EXISTS): customers with no orders.",
)
def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "outer_join_nation_counts",
    oracle="""
SELECT n.n_name AS nation, count(c.c_custkey) AS n_customers
FROM nation n
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    tags=("relational", "join"),
    doc="Left outer join preserving empty nations (count over null keys = 0).",
)
def q_outer_join_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@register(
    "large_volume_orders",
    oracle="""
SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
       SUM(CAST(round(l.l_quantity, 6) AS DECIMAL(38,8))) AS total_qty
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING SUM(CAST(round(l.l_quantity, 6) AS DECIMAL(38,8))) > 140
""",
    tags=("relational", "join"),
    doc="TPC-H Q18 shape: fact-fact join + group + HAVING on the sum.",
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity"), "total_qty"))
        .where(F.col("total_qty") > 140)
    )


# --- windows ---------------------------------------------------------------


@register(
    "top_customers_per_nation",
    oracle="""
SELECT nation, c_custkey, c_acctbal, "rank" FROM (
    SELECT n.n_name AS nation, c.c_custkey, c.c_acctbal,
           row_number() OVER (
               PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey
           ) AS "rank"
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
) WHERE "rank" <= 3
""",
    tags=("relational", "window"),
    doc="Ranking window: top-3 customers by balance within each nation.",
)
def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("nation").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), "c_custkey", "c_acctbal")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
    )


@register(
    "running_customer_spend",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       SUM(CAST(round(o_totalprice, 6) AS DECIMAL(38,8))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS running_spend
FROM orders
""",
    tags=("relational", "window"),
    doc="Analytic frame: per-customer running total in order-date order.",
)
def q_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.round(F.col("o_totalprice"), 6).cast("decimal(38,8)"))
        .over(w)
        .alias("running_spend"),
    )


@register(
    "order_gaps_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       lag(o_orderkey) OVER w AS prev_orderkey,
       lead(o_orderkey) OVER w AS next_orderkey,
       CAST(date_diff('day',
            CAST(lag(o_orderdate) OVER w AS DATE),
            CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("relational", "window"),
    doc="lag/lead navigation + day difference between consecutive orders.",
)
def q_order_gaps_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag("o_orderdate").over(w).cast("date"),
        ).cast("long").alias("days_since_prev"),
    )


@register(
    "ntile_value_buckets",
    oracle="""
SELECT event_id, value,
       CAST(ntile(4) OVER (ORDER BY value, event_id) AS BIGINT) AS quartile
FROM events
""",
    tags=("relational", "window"),
    doc="ntile quartiles over a global ordering (deterministic tie-break).",
)
def q_ntile_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.orderBy("value", "event_id")
    return e.select(
        "event_id", "value", F.ntile(4).over(w).cast("long").alias("quartile")
    )


# --- set operations --------------------------------------------------------


@register(
    "set_intersect_buyers",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
""",
    tags=("relational", "setop"),
    doc="INTERSECT: customers with both urgent and low-priority orders.",
)
def q_set_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = o.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(low)


@register(
    "set_except_buyers",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    tags=("relational", "setop"),
    doc="EXCEPT: urgent-order customers minus finished-order customers.",
)
def q_set_except_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.subtract(finished)


@register(
    "union_account_holders",
    oracle="""
SELECT c_custkey AS acct_id, c_acctbal AS balance, 'customer' AS kind FROM customer
UNION ALL
SELECT s_suppkey AS acct_id, s_acctbal AS balance, 'supplier' AS kind FROM supplier
""",
    tags=("relational", "setop"),
    doc="UNION ALL of two heterogeneous sources into one schema.",
)
def q_union_account_holders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("acct_id"),
        F.col("c_acctbal").alias("balance"),
        F.lit("customer").alias("kind"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("acct_id"),
        F.col("s_acctbal").alias("balance"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


# --- scalar function families ---------------------------------------------


@register(
    "json_props_extract",
    oracle="""
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
""",
    tags=("relational", "functions"),
    doc="JSON extraction from the events.props string column.",
)
def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_id", "event_type", k.alias("k_value"))
        .where(F.col("k_value") > 90)
    )


@register(
    "date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS order_day,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date
FROM orders
WHERE EXTRACT(year FROM o_orderdate) = 1997
""",
    tags=("relational", "functions"),
    doc="Date/time family: extract, truncate, interval arithmetic.",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(F.year("o_orderdate") == 1997)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
            F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAYS"))
            .cast("timestamp")
            .alias("due_date"),
        )
    )


@register(
    "string_functions",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       CAST(length(p_name) AS BIGINT) AS name_len,
       substr(p_brand, 7) AS brand_num,
       concat(p_type, '/', p_brand) AS type_brand,
       replace(p_name, 'widget', 'gadget') AS renamed
FROM part
WHERE p_name LIKE '%widget%'
""",
    tags=("relational", "functions"),
    doc="String family: case, length, substring, concat, replace, LIKE.",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.where(F.col("p_name").like("%widget%"))
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_brand", 7, 2147483647).alias("brand_num"),
            F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
            F.regexp_replace("p_name", "widget", "gadget").alias("renamed"),
        )
    )


@register(
    "math_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(sqrt(l_quantity), 6) AS qty_sqrt,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       round(power(1 + l_discount, 2), 6) AS disc_sq,
       CAST(l_partkey % 10 AS BIGINT) AS part_mod,
       abs(l_extendedprice * -1) AS price_abs
FROM lineitem
WHERE l_linenumber = 1
""",
    tags=("relational", "functions"),
    doc="Math family: sqrt, ceil/floor, power, modulo, abs.",
)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_linenumber") == 1)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
            F.ceil("l_extendedprice").alias("price_ceil"),
            F.floor("l_extendedprice").alias("price_floor"),
            F.round(F.pow(1 + F.col("l_discount"), 2), 6).alias("disc_sq"),
            (F.col("l_partkey") % 10).cast("long").alias("part_mod"),
            F.abs(F.col("l_extendedprice") * -1).alias("price_abs"),
        )
    )


@register(
    "array_functions",
    oracle="""
SELECT p_size,
       list_sort(list(DISTINCT p_brand)) AS brands,
       CAST(len(list(DISTINCT p_brand)) AS BIGINT) AS n_brands,
       list_transform(range(1, 4), x -> x * p_size) AS size_multiples
FROM part
GROUP BY p_size
""",
    tags=("relational", "functions"),
    doc="Array family: collect_set, sort, size, transform over a sequence.",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_size").agg(
        F.sort_array(F.collect_set("p_brand")).alias("brands"),
        F.size(F.collect_set("p_brand")).cast("long").alias("n_brands"),
        F.transform(
            F.sequence(F.lit(1), F.lit(3)), lambda x: x * F.col("p_size")
        ).alias("size_multiples"),
    )


@register(
    "case_when_buckets",
    oracle="""
SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'medium'
            ELSE 'large' END AS bucket,
       count(*) AS n_orders,
       SUM(CAST(round(o_totalprice, 6) AS DECIMAL(38,8))) AS total
FROM orders
GROUP BY 1
""",
    tags=("relational", "functions"),
    doc="CASE WHEN bucketing + aggregate.",
)
def q_case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n_orders"), dsum(F.col("o_totalprice"), "total"))
    )


@register(
    "pivot_status_by_priority",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
FROM orders
GROUP BY o_orderpriority
""",
    tags=("relational", "agg"),
    doc="Pivot (wide conditional aggregation) of status counts by priority.",
)
def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
            F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
            F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
        )
    )


@register(
    "orders_above_cust_avg",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM (
    SELECT o_orderkey, o_custkey, o_totalprice,
           avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
    FROM orders
)
WHERE o_totalprice > 1.5 * cust_avg
""",
    tags=("relational", "window"),
    doc="Correlated-subquery shape via a window average (no self-join).",
)
def q_orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .where(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "global_topk_orders",
    oracle="""
SELECT o_orderkey, o_totalprice,
       row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS "rank"
FROM orders
QUALIFY "rank" <= 25
""",
    tags=("relational", "sort"),
    doc="Global deterministic top-k (sort + limit as explicit rank).",
)
def q_global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_orderkey", "o_totalprice")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 25)
    )
