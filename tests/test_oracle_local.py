"""Every registered query with an oracle must match DuckDB at sf0.001.

This mirrors the driver's CORRECTNESS gate (see __spark_entry__.py
docstring) so mismatches surface locally first.
"""

from __future__ import annotations

import pytest

from parallel_inverted_index_map_reduce_spark.plans.registry import all_specs

from .conftest import SF_ORACLE
from .oracle_compare import compare, duckdb_conn


def _specs_with_oracle():
    return [s for s in all_specs().values() if s.oracle is not None]


@pytest.fixture(scope="module")
def conn():
    c = duckdb_conn(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("spec", _specs_with_oracle(), ids=lambda s: s.name)
def test_oracle_match(spark, conn, spec):
    df = spec.fn(spark, SF_ORACLE)
    problems = compare(df, conn, spec.oracle, spec.name)
    assert not problems, "\n".join(problems)


def test_rows_only_specs_run(spark):
    """Specs without an oracle still must run and return a DataFrame."""
    for spec in all_specs().values():
        if spec.oracle is None:
            df = spec.fn(spark, SF_ORACLE)
            assert df.count() >= 0, spec.name
