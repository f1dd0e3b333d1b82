"""Accuracy bounds for the sketch-based approximate aggregates.

The q_approx_aggs query is rows-only in the oracle gate (sketches are
engine-specific); this is its real check: HLL++ count-distinct within
its configured relative standard deviation against the exact count,
and approximate quantiles within rank tolerance of exact percentiles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vsphere_event_streaming_spark.tables import load


def test_hll_within_rsd(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        # 5 sigma of the configured 2% rsd
        assert abs(approx[k] - n) <= max(2, 0.10 * n), (k, approx[k], n)


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    vals = sorted(r["value"] for r in ev.select("value").collect())
    n = len(vals)
    got = ev.agg(
        F.percentile_approx("value", [0.5, 0.95], 10000).alias("q")
    ).first()["q"]
    for p, g in zip([0.5, 0.95], got):
        # rank of the returned value must be within 1% of the target
        import bisect

        rank = bisect.bisect_left(vals, g) / n
        assert abs(rank - p) <= 0.01, (p, g, rank)


def test_count_min_sketch_bounds(spark):
    """CMS never underestimates, and overestimates stay within eps*N
    for the classic parameterization (w=1024 → eps≈e/1024)."""
    from pyspark.sql import functions as F

    from vsphere_event_streaming_spark.functions.sketches import (
        cms_build,
        cms_estimate,
    )
    from vsphere_event_streaming_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("t")
    ).filter(F.col("t") != "")
    exact = {r["t"]: r["n"] for r in
             tokens.groupBy("t").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_total = sum(exact.values())

    depth, width = 4, 1024
    sketch = cms_build(tokens, "t", depth=depth, width=width)
    eps_n = (2.71828 / width) * n_total

    for term, true_n in sorted(
        exact.items(), key=lambda kv: -kv[1]
    )[:30]:
        est = cms_estimate(sketch, term)
        assert est >= true_n  # CMS property: overestimate only
        assert est <= true_n + eps_n
    # unseen key estimates are bounded by collision noise, not huge
    assert cms_estimate(sketch, "zzz_never_seen") <= eps_n


def test_cms_query_overestimates_only(spark):
    """q_sketch_cms property: every CMS estimate >= the exact count
    (the sketch can only overestimate), and for the top tokens at
    sf0.001's tiny vocabulary the estimate is within the epsilon-N
    collision bound."""
    from vsphere_event_streaming_spark.queries.advanced_queries import (
        CMS_W,
        q_sketch_cms,
    )

    rows = q_sketch_cms(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    n_total = None
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    n_total = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("t")
        )
        .filter(F.col("t") != "")
        .count()
    )
    eps_n = (2.71828 / CMS_W) * n_total
    for r in rows:
        assert r["n_cms"] >= r["n_exact"], r
        assert r["n_cms"] <= r["n_exact"] + eps_n, r


def test_binned_quantile_cells_merge_and_bound_the_exact_quantile(spark):
    """L39's two contracts (the L34-b pattern applied to quantiles):
    (1) the (group, bucket, count) cells are ADDITIVE across corpus
    splits — cells(A ∪ B) == cells(A) + cells(B) cell-wise, the merge
    property a streaming monitor accumulates on; (2) each binned
    estimate BRACKETS the exact discrete quantile — the order
    statistic at rank ceil(q·n), the estimator's own definition —
    within one cell: est ≤ x_(ceil(q·n)) < est + QB_WIDTH for in-grid
    data. (The INTERPOLATED q_percentile can exceed the cell by up to
    one inter-sample gap — interpolation reads past the bracketed
    order stat — so the discrete definition is the correct exact
    counterpart.)"""
    import math

    from vsphere_event_streaming_spark.queries.advanced_queries import (
        QB_BUCKETS,
        QB_WIDTH,
        q_percentile_binned,
    )

    sf = "/root/testdata/sf0.001"
    binned = {
        r["event_type"]: r for r in q_percentile_binned(spark, sf).collect()
    }
    assert binned
    vals: dict = {}
    for r in (
        load(spark, sf, "events").select("event_type", "value").collect()
    ):
        vals.setdefault(r["event_type"], []).append(r["value"])
    assert set(vals) == set(binned)
    grid_top = QB_BUCKETS * QB_WIDTH
    for et, b in binned.items():
        xs = sorted(vals[et])
        n = len(xs)
        for q, bq in ((0.5, "p50_bin"), (0.9, "p90_bin"), (0.99, "p99_bin")):
            xq = xs[math.ceil(q * n) - 1]
            assert 0.0 <= xq < grid_top, "fixture left the grid"
            assert b[bq] <= xq < b[bq] + QB_WIDTH, (et, bq, b[bq], xq)
        assert b["p50_bin"] <= b["p90_bin"] <= b["p99_bin"]

    # additivity: cells over even/odd key splits merge to the whole
    ev = load(spark, sf, "events")
    top = F.lit(QB_BUCKETS * QB_WIDTH - QB_WIDTH)
    bucket = (
        F.when(F.isnan(F.col("value")), F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                F.least(F.greatest(F.col("value"), F.lit(0.0)), top)
                / F.lit(QB_WIDTH)
            ).cast("long")
        )
        .alias("qb")
    )

    def cells_of(df):
        rows = (
            df.groupBy("event_type", bucket)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        return {(r["event_type"], r["qb"]): r["cnt"] for r in rows}

    whole = cells_of(ev)
    a = cells_of(ev.filter(F.col("event_id") % 2 == 0))
    b = cells_of(ev.filter(F.col("event_id") % 2 == 1))
    merged: dict = {}
    for part in (a, b):
        for k, c in part.items():
            merged[k] = merged.get(k, 0) + c
    assert merged == whole
