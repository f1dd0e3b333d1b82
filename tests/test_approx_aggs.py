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
