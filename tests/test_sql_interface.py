"""The SQL entry point: register_views exposes every table to
spark.sql, and SQL text produces the same results as the DataFrame
programs — users can drive the engine either way."""

from __future__ import annotations

from parallel_inverted_index_map_reduce_spark.plans.registry import all_specs
from parallel_inverted_index_map_reduce_spark.sources.tables import register_views

from .conftest import SF_ORACLE


def test_sql_matches_dataframe_aggregate(spark):
    register_views(spark, SF_ORACLE)
    got = spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus
        """
    )
    want = (
        all_specs()["pivot_status_by_priority"]
        .fn(spark, SF_ORACLE)
        .sparkSession.table("orders")
        .groupBy("o_orderstatus")
        .count()
        .withColumnRenamed("count", "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_sql_join_over_views(spark):
    register_views(spark, SF_ORACLE)
    got = spark.sql(
        """
        SELECT n.n_name AS nation, COUNT(c.c_custkey) AS n_customers
        FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
    want = all_specs()["outer_join_nation_counts"].fn(spark, SF_ORACLE)
    grows = sorted(map(tuple, got.collect()))
    wrows = sorted(map(tuple, want.select("nation", "n_customers").collect()))
    assert grows == wrows
