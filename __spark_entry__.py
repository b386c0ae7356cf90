"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(parallel_inverted_index_map_reduce_spark/plans/registry.py): every
implemented operator from SURVEY.md §2 registers a (Spark fn, oracle
SQL) pair there; this module just re-exports the dicts in the driver's
expected shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parallel_inverted_index_map_reduce_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The full reference pipeline (SURVEY.md §2 O2,O4-O13): inverted index
    over `documents` with per-letter df-desc ranking.
    """
    return _registry.all_specs()["inverted_index"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI twin for each queries() entry (omitted only
    for non-SQL-expressible ops, which get the rows-only check)."""
    return _registry.oracle_sql()
