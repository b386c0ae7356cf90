"""Stream-stream and stream-static joins over the events stream.

The reference has no join operator of any kind (SURVEY.md §2.1 — its
only key-matching is the group-by-word aggregation); batch joins live in
plans/queries_relational.py. This module adds the STREAMING join
surface a real event pipeline needs:

- stream-stream interval join (view -> purchase attribution within a
  time bound): both sides carry watermarks and the join predicate has a
  two-sided event-time constraint, so Spark can bound the state store —
  rows older than ``watermark + interval`` are evicted. Without the time
  bound the state grows forever; with it, state is O(events per
  interval), independent of stream age. That is the 100 TB-design
  property, not an optimization.
- stream-static join (dimension enrichment): the static side is a plain
  DataFrame re-read per micro-batch; no state at all. At scale the
  static side is a broadcast dim table.

Batch twins of both plans are asserted equal in
tests/test_streaming_joins.py (same bounded data through the file
source), mirroring how the window operators are verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "1 hour"


def _typed_side(events: DataFrame, event_type: str, alias: str) -> DataFrame:
    """One event type's (user_id, ts) stream, columns prefixed so the
    self-join is unambiguous."""
    return events.where(F.col("event_type") == event_type).select(
        F.col("user_id").alias(f"{alias}_user"),
        F.col("event_id").alias(f"{alias}_event"),
        F.col("ts").alias(f"{alias}_ts"),
    )


def view_purchase_attribution(
    views: DataFrame, purchases: DataFrame
) -> DataFrame:
    """(user, view, purchase) pairs where the purchase follows the view
    within ATTRIBUTION_WINDOW — works on streams and on batch frames.

    Streaming semantics: the view side is retained
    ``view watermark + window`` (a purchase may still arrive that
    matches); the purchase side needs only its own watermark. The
    interval predicate is what lets the state store evict.
    """
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"))
    )
    return (
        views.join(purchases, cond)
        .select(
            F.col("v_user").alias("user_id"),
            F.col("v_event").alias("view_event"),
            F.col("p_event").alias("purchase_event"),
            F.col("v_ts").cast("timestamp_ntz").alias("view_ts"),
            F.col("p_ts").cast("timestamp_ntz").alias("purchase_ts"),
        )
    )


def attribution_stream(events: DataFrame) -> DataFrame:
    """Watermarked stream-stream interval join over one events stream."""
    views = _typed_side(events, "view", "v").withWatermark(
        "v_ts", ATTRIBUTION_WINDOW
    )
    purchases = _typed_side(events, "purchase", "p").withWatermark(
        "p_ts", ATTRIBUTION_WINDOW
    )
    return view_purchase_attribution(views, purchases)


def attribution_batch(events: DataFrame) -> DataFrame:
    """Batch twin: identical plan minus the watermarks."""
    return view_purchase_attribution(
        _typed_side(events, "view", "v"), _typed_side(events, "purchase", "p")
    )


def enriched_type_counts(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment: join the event stream to a small
    category dim, then count per category. The dim is broadcast — tiny
    and stateless per micro-batch; counts run in complete mode."""
    return (
        events.join(F.broadcast(dim), "event_type")
        .groupBy("category")
        .agg(F.count("*").alias("n_events"))
    )


def default_type_dim(spark) -> DataFrame:
    """The event_type -> category dim used by tests and demos."""
    rows = [
        ("view", "browse"),
        ("click", "browse"),
        ("signup", "convert"),
        ("purchase", "convert"),
        ("error", "ops"),
    ]
    return spark.createDataFrame(rows, ["event_type", "category"])
