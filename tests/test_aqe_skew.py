"""AQE skew-join evidence: the engine claims runtime skew handling for
its fact-fact joins (session.py enables spark.sql.adaptive.skewJoin);
this proves it actually fires — a synthetically hot join key makes AQE
split the oversized partition, visible as ``skew=true`` on the join in
the final adaptive plan. Manual salting (operators/skew.py) remains the
fallback for engines/joins AQE cannot rewrite (e.g. pre-partitioned
bucketed joins, aggregations)."""

from __future__ import annotations

from pyspark.sql import functions as F

# Thresholds scaled down from their 256MB-class defaults so a test-size
# dataset exhibits "skew": a partition is split when it exceeds
# skewedPartitionFactor (default 5) x median AND the byte threshold.
_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_partition(spark):
    old = {}
    for k, v in _SKEW_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        n_hot, n_cold, n_keys = 200_000, 50_000, 1_000
        # the payload must be CONSUMED downstream or column pruning
        # strips it from the shuffle and the "hot" partition shrinks to
        # a run-length-compressed key column below any skew threshold
        # (measured: 24KB for 200k duplicate longs)
        hot = spark.range(n_hot).select(
            F.lit(0).cast("long").alias("l_orderkey"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        cold = spark.range(n_cold).select(
            (F.col("id") % n_keys + 1).alias("l_orderkey"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        fact = hot.unionByName(cold)
        dim = spark.range(n_keys + 1).select(
            F.col("id").alias("l_orderkey"), F.lit("d").alias("dval")
        )
        # the shipping_priority shape: fact shuffling onto a join key
        # with one pathological value
        agg = (
            fact.join(dim, "l_orderkey")
            .groupBy()
            .agg(F.count("*").alias("n"), F.sum(F.length("pad")).alias("pad_bytes"))
        )
        row = agg.collect()[0]
        assert row.n == n_hot + n_cold  # correctness under skew
        assert row.pad_bytes == row.n * 64

        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
