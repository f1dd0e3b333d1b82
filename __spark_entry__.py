"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``vsphere_event_streaming_spark``; this file
just exposes the declared-query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vsphere_event_streaming_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core read path end-to-end: events → monotonic
    offset assignment (W1) → CloudEvents envelope transform (P1-P3) →
    last-page top-k (W2) — i.e. ``GET /api/v1/events`` served by Spark.
    """
    from pyspark.sql import functions as F

    from vsphere_event_streaming_spark.log.model import assign_offsets, last_page
    from vsphere_event_streaming_spark.operators.envelope import to_envelope
    from vsphere_event_streaming_spark.tables import load

    events = load(spark, "/root/testdata/sf0.001", "events")
    log = assign_offsets(events, order_by=["ts", "event_id"], seed_col="event_id")
    envelope = to_envelope(log).withColumn("offset", F.col("data_key"))
    return last_page(envelope, 50, "offset")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered by registry PRIORITY: if a correctness check truncates to
    the first N entries, the canonical query for every §2 operator
    line is checked before any redundant variant or TPC-H shape.
    """
    qs = {name: qd.fn for name, qd in load_all().items()}
    # stderr breadcrumb so artifact readers can detect a truncated
    # correctness window (r1: 50 of 108 recorded) from counts alone
    print(f"[spark-graft] registered queries: {len(qs)}", file=sys.stderr)
    return qs


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (None → rows-only)."""
    return {
        name: qd.oracle
        for name, qd in load_all().items()
        if qd.oracle is not None
    }
