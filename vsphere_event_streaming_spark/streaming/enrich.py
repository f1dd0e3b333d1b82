"""Stream-static enrichment join (J7).

The reference's events carry entity refs (Vm/Host/..., README.md:66-72)
that a realistic consumer resolves against dimension tables. In
Structured Streaming this is the stream-static join: the streaming side
keeps its micro-batch cadence and the static side is joined per batch —
no state store involved, and a small dim is broadcast so the stream
side never shuffles.

At 100 TB-of-stream scale the static side is the small one by
definition (dimension tables); if it weren't, the answer is a
stream-stream join with watermarks, not this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a streaming DataFrame against a static dimension.

    ``how="left"`` preserves the reference's nullable-entity-ref
    semantics (unresolved dims stay NULL, SURVEY §2.3 J3). The static
    side is broadcast by default — each micro-batch becomes a map-side
    hash join with zero shuffle of the stream.
    """
    right = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(right, on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_time: str = "created_time",
    right_time: str = "created_time",
    watermark: str = "10 minutes",
    within: str = "2 minutes",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream equi-join with an event-time range condition.

    Correlates two live streams (e.g. a click with the purchase that
    follows it within ``within``). Both sides declare watermarks and
    the join condition bounds the right event time to
    ``[left_time, left_time + within]`` — together these let Spark
    compute how long each side's rows can still find a partner, so the
    symmetric-hash join state is **evicted continuously** instead of
    growing with the stream. Without both, state is unbounded and a
    100 TB/day stream OOMs; with them, state ≈ rows in the
    ``watermark + within`` horizon.

    The right side's columns are prefixed (default ``r_``) so
    self-joins of one logical stream (the common case: the reference
    has a single event stream, SURVEY §2.3 J7) need no caller-side
    renames.
    """
    renamed = right.select(
        [F.col(c).alias(right_prefix + c) for c in right.columns]
    )
    lhs = left.withWatermark(left_time, watermark)
    rhs = renamed.withWatermark(right_prefix + right_time, watermark)
    lt = F.col(left_time)
    rt = F.col(right_prefix + right_time)
    cond = (
        (F.col(on) == F.col(right_prefix + on))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    return lhs.join(rhs, cond, how)
