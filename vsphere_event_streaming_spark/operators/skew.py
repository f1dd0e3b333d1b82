"""Skew-mitigation operators (100 TB posture).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
`session.tune`) handles sort-merge joins at runtime. These cover the
two cases AQE does not:

- a *skewed aggregation* whose single hot key funnels one reducer —
  solved with a two-phase salted aggregate;
- a *skewed equi-join against a mid-size dim* (too big to broadcast
  whole, too hot to shuffle) — solved by salting the fact side with a
  deterministic hash and replicating the dim side per salt.

Salts are derived with ``xxhash64`` over the row's own columns — never
``rand()`` — so retries and replays produce identical partitioning
(the same determinism rule as offset assignment, SURVEY §4.2b).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: list[str], buckets: int) -> DataFrame:
    """Deterministic per-row salt in [0, buckets) from non-key columns."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_from: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column → (input column, fn) with fn in
    {count, sum, min, max} — the decomposable aggregates whose partial
    results merge exactly (count merges with sum). ``count`` follows
    SQL semantics: ``count('*')`` is the row count, ``count(col)``
    counts non-null values of ``col``. Phase 1 groups by (keys + salt)
    so a hot key spreads over ``buckets`` reducers; phase 2 merges the
    ≤buckets partials per key.

    Note Spark's hash aggregate already does map-side partial
    aggregation, which handles *moderate* skew; this operator is for
    the pathological case where even per-partition partials for one
    key overwhelm a single final-stage reducer (e.g. high-cardinality
    distinct-ish payloads riding along with the hot key).
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for name, (col, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"non-decomposable aggregate: {fn}")

    salted = with_salt(df, salt_from, buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (
                F.count(F.lit(1))
                if fn == "count" and col == "*"
                else getattr(F, fn)(col)
            ).alias(name)
            for name, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[aggs[name][1]])(name).alias(name)
            for name in aggs
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
    fact_salt_from: list[str] | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact, replicate the dim.

    The fact side gets a deterministic salt in [0, buckets); the dim
    side is exploded ``buckets``× (dim must be the small-but-not-
    broadcastable side — replication is its cost). The join key
    becomes (key, salt), so one hot key spreads across ``buckets``
    reducers instead of one.

    Only fact-preserving join types are allowed: a dim-preserving join
    (right/full) would emit every unmatched dim row once *per salt
    replica* — ``buckets``× duplicated outer rows.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; {how!r} would "
            f"duplicate unmatched dim rows {buckets}x (dim is replicated "
            "per salt)"
        )
    fact_salt_from = fact_salt_from or [c for c in fact.columns if c != on]
    f = with_salt(fact, fact_salt_from, buckets)
    d = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(buckets)])),
    )
    out = f.join(d, [on, "__salt"], how)
    return out.drop("__salt")
