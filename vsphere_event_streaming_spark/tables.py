"""Test-table loaders (TESTDATA.md).

All queries read the driver-generated parquet star schema. Loading is a
plain ``spark.read.parquet`` so Catalyst gets predicate pushdown,
column pruning and partition pruning for free — at 100 TB these scans
would be partitioned directories and nothing here changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(
    spark: SparkSession, sf_dir: str, name: str, raw: bool = False
) -> DataFrame:
    """Load a test table. ``raw=True`` skips the events ``ts``
    nanos→timestamp conversion, leaving ``ts`` as the stored int64 —
    predicates against the raw column reach the parquet scan
    (PushedFilters), which the converted form blocks."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    from .session import tune

    tune(spark)  # needs nanosAsLong before the parquet footer is read
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if (
        not raw
        and name == "events"
        and dict(df.dtypes).get("ts") == "bigint"
    ):
        # TIMESTAMP(NANOS) read as long; truncate to micros like DuckDB.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if not raw:
        # Fallback when inferTimestampNTZ=false didn't take (conf locked
        # by host): cast NTZ → session-tz TIMESTAMP. UTC session ⇒ same
        # wall-clock values; costs pushdown on the cast column, which is
        # why the session-conf path above is preferred.
        ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
        if ntz:
            from pyspark.sql import functions as F

            df = df.withColumns(
                {c: F.col(c).cast("timestamp") for c in ntz}
            )
    return df


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen under-partitioned inputs before a compute-bound map stage.

    A parquet file with one row group scans as ONE partition no matter
    how many cores exist, serializing any expensive per-row transform
    behind it (hashing, UDFs). This repartitions up to cluster default
    parallelism — but only when the scan is narrower than that, so at
    100 TB (thousands of splits) it is a no-op and costs nothing; on
    small inputs the extra shuffle is trivially cheap by definition.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
