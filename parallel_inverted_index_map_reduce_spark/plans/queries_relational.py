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
    # string-form aggregates: identical expression trees (sameSemantics
    # pinned in tests/test_dsum_properties.py) built through one
    # F.expr parse each instead of ~130 py4j calls — the wide Q1
    # aggregate's build cost was comparable to its execution
    disc = "l_extendedprice * (1 - l_discount)"
    charge = f"({disc}) * (1 + l_tax)"
    return (
        l.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "grouping_analytics",
    oracle="""
SELECT 'orders_rollup' AS source,
       o_orderstatus AS key1, o_orderpriority AS key2,
       count(*) AS n_rows,
       CAST(SUM(CAST(round(o_totalprice, 6) AS DECIMAL(38,8))) AS VARCHAR) AS sum_measure,
       CAST(grouping(o_orderstatus) AS BIGINT) AS g1,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g2
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'lineitem_cube',
       l_returnflag, l_linestatus,
       count(*),
       CAST(SUM(CAST(round(l_quantity, 6) AS DECIMAL(38,8))) AS VARCHAR),
       CAST(grouping(l_returnflag) AS BIGINT),
       CAST(grouping(l_linestatus) AS BIGINT)
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
UNION ALL
SELECT 'events_gsets',
       event_type, CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR),
       count(*),
       CAST(SUM(CAST(round(value, 6) AS DECIMAL(38,8))) AS VARCHAR),
       CAST(grouping(event_type) AS BIGINT),
       CAST(grouping(date_trunc('day', ts)) AS BIGINT)
FROM events
GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)), ())
UNION ALL
SELECT 'orders_buckets',
       CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'medium'
            ELSE 'large' END,
       '',
       count(*),
       CAST(SUM(CAST(round(o_totalprice, 6) AS DECIMAL(38,8))) AS VARCHAR),
       CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM orders
GROUP BY 2
""",
    tags=("relational", "agg"),
    doc="The multi-dimensional aggregation family in one labeled result: "
    "ROLLUP (hierarchical subtotals over orders), CUBE (all combinations "
    "over lineitem), explicit GROUPING SETS (by type / by day / "
    "grand total over events), each with grouping() indicators, and "
    "CASE WHEN bucketing + aggregate as the 'orders_buckets' rows "
    "(folded in from the former case_when_buckets entry — same "
    "operators, one registry slot per family). HAVING is covered by "
    "large_volume_orders.",
)
def q_grouping_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    rollup = o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        dsum("o_totalprice", "sum_measure"),
        F.grouping("o_orderstatus").cast("long").alias("g1"),
        F.grouping("o_orderpriority").cast("long").alias("g2"),
    ).select(
        F.lit("orders_rollup").alias("source"),
        F.col("o_orderstatus").alias("key1"),
        F.col("o_orderpriority").alias("key2"),
        "n_rows", "sum_measure", "g1", "g2",
    )
    cube = l.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity", "sum_measure"),
        F.grouping("l_returnflag").cast("long").alias("g1"),
        F.grouping("l_linestatus").cast("long").alias("g2"),
    ).select(
        F.lit("lineitem_cube").alias("source"),
        F.col("l_returnflag").alias("key1"),
        F.col("l_linestatus").alias("key2"),
        "n_rows", "sum_measure", "g1", "g2",
    )
    _t(spark, sf_dir, "events").createOrReplaceTempView("ga_events")
    gsets = spark.sql(
        """
        SELECT 'events_gsets' AS source,
               event_type AS key1,
               CAST(date_trunc('day', ts) AS STRING) AS key2,
               count(*) AS n_rows,
               CAST(SUM(CAST(round(value, 6) AS DECIMAL(38,8))) AS STRING)
                   AS sum_measure,
               CAST(grouping(event_type) AS BIGINT) AS g1,
               CAST(grouping(date_trunc('day', ts)) AS BIGINT) AS g2
        FROM ga_events
        GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)), ())
        """
    )
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    buckets = (
        o.groupBy(bucket.alias("key1"))
        .agg(F.count("*").alias("n_rows"), dsum("o_totalprice", "sum_measure"))
        .select(
            F.lit("orders_buckets").alias("source"),
            "key1",
            F.lit("").alias("key2"),
            "n_rows",
            "sum_measure",
            F.lit(0).cast("long").alias("g1"),
            F.lit(0).cast("long").alias("g2"),
        )
    )
    return rollup.unionByName(cube).unionByName(gsets).unionByName(buckets)


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
SELECT l_orderkey, CAST(revenue AS VARCHAR) AS revenue, o_orderdate,
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
    from .exprs import as_str, dsum_dec

    rev = (
        # No broadcast hint on customer: the segment filter keeps ~1/5 of
        # a fact-growing table, which outgrows executor memory at scale.
        # AQE picks broadcast at small SF from runtime stats and can
        # switch to shuffle join when the side is genuinely large.
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_dec("l_extendedprice * (1 - l_discount)").alias("revenue"))
    )
    # rank over the DECIMAL (numeric order); render as string at the end
    w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .select("l_orderkey", as_str(F.col("revenue")).alias("revenue"),
                "o_orderdate", "rank")
    )


@register(
    "local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6) AS DECIMAL(38,8))) AS VARCHAR) AS revenue
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
    # Only region/nation-derived dims carry an explicit broadcast hint.
    # customer/supplier grow with scale factor: a forced broadcast OOMs at
    # 100 TB and cannot be overridden by AQE, so their join strategy is
    # left to AQE (locally they still broadcast — they're under the
    # autoBroadcastJoinThreshold — but that's a runtime decision).
    cust = c.join(F.broadcast(dims), c.c_nationkey == dims.n_nationkey).select(
        "c_custkey", "c_nationkey"
    )
    # n_name rides the supplier side (nationkey is the nation PK, so the
    # name is functionally determined): the former third broadcast join
    # of dims after the fact-fact join re-derived a value this row
    # already carried — one BroadcastExchange build + join stage
    # removed, rows identical.
    supp = s.join(F.broadcast(dims), s.s_nationkey == dims.n_nationkey).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    # Join order: reduce BOTH fact sides through the region-selective
    # dims BEFORE the fact-fact shuffle — only ~1/|regions| of lineitem
    # (ASIA suppliers) and of orders (ASIA customers) reach the big
    # orderkey join. Catalyst has no table stats here, so the selective
    # order is stated explicitly rather than left to reordering.
    l_asia = l.join(supp, l.l_suppkey == supp.s_suppkey)
    o_asia = o.join(cust, o.o_custkey == cust.c_custkey)
    joined = l_asia.join(o_asia, l_asia.l_orderkey == o_asia.o_orderkey).where(
        F.col("s_nationkey") == F.col("c_nationkey")
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        dsum("l_extendedprice * (1 - l_discount)", "revenue")
    )


@register(
    "semi_anti_join_customers",
    oracle="""
SELECT 'semi' AS kind, c_custkey, c_name FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
UNION ALL
SELECT 'anti', c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
)
""",
    tags=("relational", "join"),
    doc="Existence joins in one labeled result: left-semi (EXISTS — "
    "customers with an urgent order) and left-anti (NOT EXISTS — "
    "customers with no orders).",
)
def q_semi_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    o = _t(spark, sf_dir, "orders")
    semi = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi").select(
        F.lit("semi").alias("kind"), "c_custkey", "c_name"
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("anti").alias("kind"), "c_custkey", "c_name"
    )
    return semi.unionByName(anti)


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
       CAST(SUM(CAST(round(l.l_quantity, 6) AS DECIMAL(38,8))) AS VARCHAR)
           AS total_qty
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING SUM(CAST(round(l.l_quantity, 6) AS DECIMAL(38,8))) > 140
""",
    tags=("relational", "join"),
    doc="TPC-H Q18 shape: fact-fact join + group + HAVING on the sum "
    "(the post-aggregation-filter operator lives here).",
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .exprs import as_str, dsum_dec

    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum_dec("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 140)  # HAVING: filter on the decimal
        .withColumn("total_qty", as_str(F.col("total_qty")))
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
    "window_navigation",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       lag(o_orderkey) OVER w AS prev_orderkey,
       lead(o_orderkey) OVER w AS next_orderkey,
       CAST(date_diff('day',
            CAST(lag(o_orderdate) OVER w AS DATE),
            CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER wf AS last_order,
       nth_value(o_orderkey, 2) OVER wf AS second_order,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       CAST(CAST(round(CAST(percent_rank() OVER w AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS VARCHAR) AS pct_rank,
       CAST(CAST(round(CAST(cume_dist() OVER w AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS VARCHAR) AS cume,
       CAST(SUM(CAST(round(o_totalprice, 6) AS DECIMAL(38,8))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS VARCHAR) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("relational", "window"),
    doc="The analytic-window family over ONE deterministic per-customer "
    "ordering, so one shuffle serves them all: lag/lead navigation with "
    "day gaps, first/last/nth value, ntile quartiles, percent_rank / "
    "cume_dist, and a running decimal-sum frame.",
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .exprs import stable_round6

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        stable_round6(F.percent_rank().over(w)).alias("pct_rank"),
        stable_round6(F.cume_dist().over(w)).alias("cume"),
        F.sum(F.round(F.col("o_totalprice"), 6).cast("decimal(38,8)"))
        .over(w_run)
        .cast("string")
        .alias("running_spend"),
    )


# --- set operations --------------------------------------------------------


@register(
    "set_intersect_except",
    oracle="""
SELECT 'intersect' AS op, custkey AS key, '' AS val FROM (
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
UNION ALL
SELECT 'except', custkey, '' FROM (
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
UNION ALL
SELECT 'union_customer', c_custkey, CAST(c_acctbal AS VARCHAR) FROM customer
UNION ALL
SELECT 'union_supplier', s_suppkey, CAST(s_acctbal AS VARCHAR) FROM supplier
""",
    tags=("relational", "setop"),
    doc="ALL the set operators in one labeled result: INTERSECT "
    "(customers with both urgent and low-priority orders), EXCEPT "
    "(urgent-order customers minus finished-order customers), and "
    "UNION ALL of two heterogeneous sources (customer + supplier "
    "account holders) unified into one schema — val carries the "
    "account balance for the union rows.",
)
def q_set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("key")
    )
    low = o.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("key")
    )
    finished = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("key")
    )
    blank = F.lit("").alias("val")
    inter = urgent.intersect(low).select(
        F.lit("intersect").alias("op"), "key", blank
    )
    exc = urgent.subtract(finished).select(
        F.lit("except").alias("op"), "key", blank
    )
    c = _t(spark, sf_dir, "customer").select(
        F.lit("union_customer").alias("op"),
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").cast("string").alias("val"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("union_supplier").alias("op"),
        F.col("s_suppkey").alias("key"),
        F.col("s_acctbal").cast("string").alias("val"),
    )
    return inter.unionByName(exc).unionByName(c).unionByName(s)


# --- scalar function families ---------------------------------------------


@register(
    "json_map_functions",
    oracle="""
SELECT event_id, event_type, 'k' AS map_key,
       CAST(json_extract(props, '$.k') AS BIGINT) AS map_value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) > 90 AS high_k
FROM events
WHERE props IS NOT NULL
""",
    tags=("relational", "functions", "map"),
    doc="JSON + map families over events.props: json-path extraction "
    "(get_json_object), parse into map<string,long> + explode entries "
    "(generic on the Spark side; the oracle exploits the fixture's "
    "single known key), and a derived predicate column.",
)
def q_json_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.where(F.col("props").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.explode(F.from_json("props", "map<string,bigint>")).alias(
                "map_key", "map_value"
            ),
            k.alias("k_value"),
            (k > 90).alias("high_k"),
        )
    )


@register(
    "date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS order_day,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
       strftime(o_orderdate, '%Y-%m') AS ym,
       CAST(extract(dow FROM o_orderdate) + 1 AS BIGINT) AS dow,
       CAST(extract(week FROM o_orderdate) AS BIGINT) AS iso_week,
       CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
FROM orders
WHERE o_orderkey % 100 = 0
""",
    tags=("relational", "functions"),
    doc="Date/time family in one pass: extract (y/m/d, day-of-week, ISO "
    "week, quarter), truncate, interval arithmetic, pattern formatting, "
    "epoch seconds.",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
            F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAYS"))
            .cast("timestamp")
            .alias("due_date"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.dayofweek("o_orderdate").cast("long").alias("dow"),
            F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.unix_timestamp("o_orderdate").alias("epoch_sec"),
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
       replace(p_name, 'widget', 'gadget') AS renamed,
       regexp_extract(p_name, '^(\\w+) (\\w+)$', 1) AS adjective,
       regexp_extract(p_name, '^(\\w+) (\\w+)$', 2) AS noun,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part
WHERE regexp_matches(p_name, 'widget|gizmo')
""",
    tags=("relational", "functions"),
    doc="String + regexp families in one pass: case, length, substring, "
    "concat, replace, rlike filter, group extraction, global replace.",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    pat = r"^(\w+) (\w+)$"
    return (
        p.where(F.col("p_name").rlike("widget|gizmo"))
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_brand", 7, 2147483647).alias("brand_num"),
            F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
            F.regexp_replace("p_name", "widget", "gadget").alias("renamed"),
            F.regexp_extract("p_name", pat, 1).alias("adjective"),
            F.regexp_extract("p_name", pat, 2).alias("noun"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
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
       array_to_string(list_sort(list(DISTINCT p_brand)), ' ') AS brands,
       CAST(len(list(DISTINCT p_brand)) AS BIGINT) AS n_brands,
       array_to_string(list_transform(range(1, 4), x -> x * p_size), ' ')
           AS size_multiples
FROM part
GROUP BY p_size
""",
    tags=("relational", "functions"),
    doc="Array family: collect_set, sort, size, transform over a "
    "sequence, array_join serialization (scalar-typed result).",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_size").agg(
        F.array_join(F.sort_array(F.collect_set("p_brand")), " ").alias("brands"),
        F.size(F.collect_set("p_brand")).cast("long").alias("n_brands"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(3)),
                lambda x: (x * F.col("p_size")).cast("string"),
            ),
            " ",
        ).alias("size_multiples"),
    )


# case_when_buckets was folded into grouping_analytics as the
# 'orders_buckets' labeled source — same CASE WHEN bucketing + decimal
# aggregate, one registry slot per aggregation family (the freed slot
# went to pipeline_hygiene in queries_dedup.py).


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


# Global deterministic top-k (sort + rank + limit) is exercised by
# shipping_priority (global top-10 over the join result) and ann_topk
# (per-query rank windows) — it no longer needs a standalone spec.
