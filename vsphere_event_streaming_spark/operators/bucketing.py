"""Bucketed storage for co-located joins (the 100 TB join path).

A fact⋈fact equi-join shuffles both sides on every query. When the
same join key is hit repeatedly (orders⋈lineitem on orderkey, log
segments on offset range), the scalable answer is to pay the shuffle
ONCE at write time: bucket both tables by the join key into the same
bucket count. Each table's files then carry a
``HashPartitioning(key, n)`` guarantee the planner trusts, so
``EnsureRequirements`` inserts **no Exchange** on either side — the
join runs scan→(sort)→merge with zero network movement, and with
``sortBy`` at write time the sort is often free too.

This mirrors the reference's single design microtrick at storage
level: "serialize once, serve raw" (cmd/server/main.go:134 +
cmd/server/server.go:294-295) — do the expensive organization on the
write path, make every read cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    *,
    path: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Write ``df`` as a bucketed (+ optionally sorted) table and
    return the catalog-backed DataFrame.

    ``n_buckets`` sizes per-bucket data, not parallelism: pick it so
    one bucket of the LARGER table fits an executor's memory at the
    target scale (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket —
    too big; 32k buckets ≈ 3 GB — right for a 8-16 GB executor).
    Both join sides must use the same count and key.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Write a directory-partitioned parquet sink (hive layout).

    The scale form of the engine's log sink: partition the ingest
    output by a low-cardinality derived key (event date, offset
    range) so that every time-bounded read — replay-from, retention
    purge, the reference's now−5m horizon — prunes whole directories
    at planning time (``PartitionFilters`` in the scan, zero I/O for
    excluded partitions) instead of relying on row-group statistics.
    Rule of thumb: partitions of 100 MB-1 GB; never partition by a
    high-cardinality key (one dir per value kills the file system).
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def colocated_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-count bucketed tables.

    Plain ``join`` — the co-location is a property of the inputs, not
    of the operator; this wrapper exists as the documented entry point
    and so tests can assert its plan never contains an Exchange.
    """
    return left.join(right, on, how)
