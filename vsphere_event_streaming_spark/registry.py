"""Declared-query registry.

Every operator from SURVEY.md §2 registers here as a named query: a
``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible)
the equivalent ANSI SQL a DuckDB oracle runs on the same parquet
tables. ``__spark_entry__.py`` exposes this registry to the driver.

Cross-engine determinism rules every query follows:

- alias every computed column identically in Spark and SQL;
- money/double aggregates go through ``decimal`` casts so sums are
  exact (order-independent) in both engines, then back to double;
- timestamps stay in UTC (session tz pinned by ``session.tune``);
- top-k queries break ties on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query (decorator)."""

    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QueryDef(fn=fn, oracle=oracle)
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side-effect: registration)."""
    from .queries import (  # noqa: F401
        advanced_queries,
        log_queries,
        pipeline_queries,
        relational_queries,
        scalar_queries,
        streaming_queries,
    )

    return QUERIES
