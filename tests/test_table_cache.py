"""load_table memoization: same plan object back per (session, file
state); rewrite invalidates; directory layouts never memoize."""

from __future__ import annotations

import os
import shutil

from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_load_table_memoizes_per_file_state(spark):
    a = load_table(spark, SF_SMALL, "nation")
    b = load_table(spark, SF_SMALL, "nation")
    assert a is b  # identical plan object, zero re-resolution cost
    # distinct tables are distinct entries
    c = load_table(spark, SF_SMALL, "region")
    assert c is not a


def test_load_table_rewrite_invalidates(spark, tmp_path):
    sf_dir = str(tmp_path)
    src = os.path.join(SF_SMALL, "nation.parquet")
    dst = os.path.join(sf_dir, "nation.parquet")
    shutil.copyfile(src, dst)
    first = load_table(spark, sf_dir, "nation")
    n_first = first.count()
    # rewrite the file with different content (region has another schema,
    # but invalidation must happen purely on file state, so keep schema:
    # write a 1-row slice back out)
    one = spark.read.parquet(src).limit(1)
    tmp_out = os.path.join(sf_dir, "one_row")
    one.write.mode("overwrite").parquet(tmp_out)
    part = [p for p in os.listdir(tmp_out) if p.endswith(".parquet")][0]
    shutil.copyfile(os.path.join(tmp_out, part), dst)
    os.utime(dst)  # ensure mtime moves even on coarse filesystems
    second = load_table(spark, sf_dir, "nation")
    assert second is not first
    assert second.count() == 1
    assert n_first != 1
    # the rewrite REPLACED the entry (path-keyed): exactly one cache
    # slot per path, so repeated rewrites cannot grow the cache or pin
    # superseded JVM plans for the session's lifetime
    cache = spark._graft_table_cache
    assert sum(1 for k in cache if k == dst) == 1
    assert cache[dst][1] is second


def test_load_table_directory_layout_not_memoized(spark, tmp_path):
    # a directory table (the lake case) must re-resolve every call
    sf_dir = str(tmp_path)
    d = os.path.join(sf_dir, "nation.parquet")
    os.makedirs(d)
    spark.read.parquet(os.path.join(SF_SMALL, "nation.parquet")).write.mode(
        "overwrite"
    ).parquet(d)
    a = load_table(spark, sf_dir, "nation")
    b = load_table(spark, sf_dir, "nation")
    assert a is not b
    assert a.count() == b.count()
