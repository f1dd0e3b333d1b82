"""Join operators (SURVEY §2.3 — all [EXT]; reference has no joins).

Events carry entity references (Vm/Host/... — reference
README.md:66-72) that a realistic consumer resolves against dimension
tables; these are the engine's join strategies, chosen for 100 TB:

- small dims → explicit ``broadcast()`` (no shuffle of the fact side);
- fact-fact → sort-merge with AQE skew splitting (Catalyst default);
- as-of → expressed as join + per-key window top-1, the shuffle is on
  the equi key only, never a cross product;
- range/theta → always anchored on an equi key so Catalyst keeps a
  hash/SMJ join and evaluates the range as a post-join predicate
  (a pure theta join would be a broadcast-nested-loop — refuse that
  at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on: Column | list[str], how: str = "inner"
) -> DataFrame:
    """Fact ⋈ broadcast(dim): map-side hash join, zero fact shuffle."""
    return fact.join(F.broadcast(dim), on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    tiebreakers: list[str] | None = None,
    how: str = "left",
    left_key: str | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
    allow_unkeyed: bool = False,
) -> DataFrame:
    """As-of join: the matching ``right`` row at-or-before
    (``backward``, the default), at-or-after (``forward``), or
    closest in either direction (``nearest``, r13 — exact
    integer-microsecond distance) of each left row's time.

    ``tolerance`` (an INTERVAL string, e.g. ``"30 days"``) bounds the
    staleness: a backward match must also satisfy
    ``right_time > left_time - tolerance`` (forward: mirrored). The
    bound is EXCLUSIVE — a right row exactly ``tolerance`` old does
    NOT match, unlike pandas ``merge_asof(tolerance=)`` whose bound is
    inclusive (``>=``); the q_join_asof_tol oracle mirrors the
    exclusive form, so both engines agree. Without it, a
    years-stale dim row silently "matches"; with it, stale left rows
    fall to NULLs under ``how="left"`` (count them — that is the
    data-freshness alarm a production join wants).

    J6: latest dim state at event time. Implementation: equi-join on
    the key (shuffle on key only), keep right rows with
    ``right_time <= left_time``, then per left-row ``row_number`` over
    (right_time desc, tiebreakers desc) and keep rank 1. For skewed
    keys AQE splits the join; the window partitions by the left row's
    identity so it never re-sorts the whole table globally.

    Right columns that clash with left ones must be pre-aliased by the
    caller. Pass ``left_key`` (a unique left column) — it keeps the
    plan fully deterministic under task retry. For a genuinely keyless
    left side, ``allow_unkeyed=True`` opts into a
    ``monotonically_increasing_id`` row identity, which is
    RETRY-NONDETERMINISTIC (a recomputed partition can renumber rows,
    so two left rows identical in every column may swap matches);
    without the opt-in, a keyless call raises instead of silently
    risking that (VERDICT_r5 "What's wrong" #2).
    """
    tiebreakers = tiebreakers or []
    if left_key is not None:
        lid = left_key
        l = left
    else:
        if not allow_unkeyed:
            raise ValueError(
                "asof_join without left_key is retry-nondeterministic "
                "(monotonically_increasing_id row identity); pass a "
                "unique left_key, or allow_unkeyed=True to accept it"
            )
        lid = "__asof_lid"
        l = left.withColumn(lid, F.monotonically_increasing_id())
    if direction == "backward":
        time_cond = F.col(right_time) <= F.col(left_time)
        if tolerance is not None:
            time_cond = time_cond & (
                F.col(right_time)
                > F.col(left_time) - F.expr(f"INTERVAL {tolerance}")
            )
        order = [F.col(right_time).desc_nulls_last()] + [
            F.col(t).desc_nulls_last() for t in tiebreakers
        ]
    elif direction == "forward":
        time_cond = F.col(right_time) >= F.col(left_time)
        if tolerance is not None:
            time_cond = time_cond & (
                F.col(right_time)
                < F.col(left_time) + F.expr(f"INTERVAL {tolerance}")
            )
        order = [F.col(right_time).asc_nulls_last()] + [
            F.col(t).asc_nulls_last() for t in tiebreakers
        ]
    elif direction == "nearest":
        # closest right row in EITHER time direction (r13 — completes
        # the pandas merge_asof direction trio). Requires
        # timestamp-castable time columns: the ranking distance is
        # exact integer MICROSECONDS (unix_micros ≡ DuckDB epoch_us),
        # never a float subtraction, so equidistant candidates rank
        # identically in every engine. Ties (same distance before and
        # after) prefer the EARLIER right_time, then the caller's
        # tiebreakers ascending — documented, deterministic.
        dist = F.abs(
            F.unix_micros(F.col(right_time).cast("timestamp"))
            - F.unix_micros(F.col(left_time).cast("timestamp"))
        )
        time_cond = F.lit(True)
        if tolerance is not None:
            # exclusive on both sides, the module's tolerance
            # convention (backward/forward are exclusive too)
            time_cond = (
                F.col(right_time)
                > F.col(left_time) - F.expr(f"INTERVAL {tolerance}")
            ) & (
                F.col(right_time)
                < F.col(left_time) + F.expr(f"INTERVAL {tolerance}")
            )
        order = [
            dist.asc_nulls_last(),
            F.col(right_time).asc_nulls_last(),
        ] + [F.col(t).asc_nulls_last() for t in tiebreakers]
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown direction {direction!r}")
    cond = (F.col(left_on) == F.col(right_on)) & time_cond
    joined = l.join(right, cond, how)
    w = Window.partitionBy(lid).orderBy(*order)
    out = (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .drop("__asof_rn")
    )
    return out if left_key is not None else out.drop(lid)


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-anchored interval join (J5).

    The equi condition drives the physical join (hash/SMJ); the range
    bounds are residual predicates. Never pass a bare range without an
    equi anchor at scale — that forces a nested-loop join.
    """
    return left.join(right, equi & lower & upper, how)


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_ts: str,
    hi_expr: Column,
    bin_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Pure range join (NO equi key) made scale-safe by binning — the
    interval-join technique streaming/temporal engines use when
    nothing anchors a hash join: bucket event time into fixed
    ``bin_seconds`` bins, explode each interval onto every bin it
    overlaps, equi-join on the bin, then apply the exact containment
    predicate as a residual.

    A point lives in exactly ONE bin, so each (point, interval) pair
    meets exactly once — no dedup step. An interval of length <= W
    explodes onto at most 2 bins, so the fan-out is a small constant
    when ``bin_seconds`` is chosen >= the typical interval length.
    The physical plan becomes a shuffled hash/sort-merge join on the
    bin key (plan-audited: q_join_range_binned forbids
    BroadcastNestedLoopJoin/CartesianProduct) instead of the
    nested-loop a bare theta join forces — the difference between
    O(n·m) and O(n+m) at 100 TB.

    ``hi_expr`` is the EXCLUSIVE upper bound as a Column over the
    interval side's columns. NULL timestamps drop on both sides (a
    NULL never satisfies the containment predicate; binning drops it
    identically). Inner join only: the containment residual runs
    AFTER the bin join, which would silently discard an outer join's
    unmatched rows — asking for one is an error, not a wrong answer."""
    if how != "inner":
        raise ValueError(
            "binned_range_join is inner-only (the containment residual "
            f"would drop outer-join null rows): {how!r}"
        )
    w_us = bin_seconds * 1_000_000
    p = points.withColumn(
        "__bin", (F.unix_micros(F.col(point_ts)) / w_us).cast("long")
    )
    lo_us = F.unix_micros(F.col(lo_ts))
    hi_us = F.unix_micros(hi_expr)
    # Empty/inverted intervals (hi <= lo) can never satisfy the
    # containment predicate, but sequence(start, stop) with start >
    # stop generates a DESCENDING bin list — a data-quality row would
    # become a candidate-set blowup instead of zero rows. Drop them
    # before binning (NULL-safe: NULL bounds fail the > too).
    iv = intervals.filter(hi_us > lo_us).withColumn(
        "__bins",
        F.sequence(
            (lo_us / w_us).cast("long"),
            # exclusive upper bound: the bin of hi-1us
            ((hi_us - 1) / w_us).cast("long"),
        ),
    ).withColumn("__bin", F.explode("__bins")).drop("__bins")
    joined = p.join(iv, "__bin", how).filter(
        (F.col(point_ts) >= F.col(lo_ts)) & (F.col(point_ts) < hi_expr)
    )
    return joined.drop("__bin")
