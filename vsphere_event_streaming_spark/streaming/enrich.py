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
