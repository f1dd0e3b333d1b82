"""Salted skew operators: results must equal their unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from vsphere_event_streaming_spark.operators.skew import (
    salted_agg,
    salted_join,
)


def _skewed_df(spark):
    # one pathologically hot key (90%) + a long tail
    rows = [("hot", i, float(i % 7)) for i in range(9000)]
    rows += [(f"k{i % 50}", i, float(i % 11)) for i in range(1000)]
    return spark.createDataFrame(rows, "key string, v long, x double")


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r["key"]: (r["n"], r["sv"], r["mx"])
        for r in df.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.max("x").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["key"]: (r["n"], r["sv"], r["mx"])
        for r in salted_agg(
            df,
            keys=["key"],
            aggs={"n": ("v", "count"), "sv": ("v", "sum"), "mx": ("x", "max")},
            salt_from=["v"],
            buckets=16,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(50)],
        "key string, label string",
    )
    plain = sorted(
        (r["key"], r["v"], r["label"])
        for r in fact.join(dim, "key").collect()
    )
    salted = sorted(
        (r["key"], r["v"], r["label"])
        for r in salted_join(fact, dim, on="key", buckets=8).collect()
    )
    assert salted == plain
    # left join preserves unmatched fact rows
    fact2 = fact.union(
        spark.createDataFrame([("orphan", 1, 0.0)], fact.schema)
    )
    left = salted_join(fact2, dim, on="key", buckets=8, how="left")
    orphan = left.filter(F.col("key") == "orphan").collect()
    assert len(orphan) == 1 and orphan[0]["label"] is None
