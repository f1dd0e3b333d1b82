"""Salted skew operators: results must equal their unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from vsphere_event_streaming_spark.operators.skew import (
    salted_agg,
    salted_join,
)


def _skewed_df(spark):
    # one pathologically hot key (90%) + a long tail; every 10th v is
    # NULL so SQL count semantics are observable: count(v) must count
    # non-nulls while count(*) counts rows
    rows = [
        ("hot", None if i % 10 == 0 else i, float(i % 7))
        for i in range(9000)
    ]
    rows += [(f"k{i % 50}", i, float(i % 11)) for i in range(1000)]
    return spark.createDataFrame(rows, "key string, v long, x double")


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r["key"]: (r["n_rows"], r["n_v"], r["sv"], r["mx"])
        for r in df.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_v"),
            F.sum("v").alias("sv"),
            F.max("x").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["key"]: (r["n_rows"], r["n_v"], r["sv"], r["mx"])
        for r in salted_agg(
            df,
            keys=["key"],
            aggs={
                "n_rows": ("*", "count"),
                "n_v": ("v", "count"),
                "sv": ("v", "sum"),
                "mx": ("x", "max"),
            },
            salt_from=["x"],
            buckets=16,
        ).collect()
    }
    assert salted == plain
    # the fixture actually exercises the distinction
    assert plain["hot"][0] == 9000 and plain["hot"][1] == 8100


def test_salted_join_matches_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(50)],
        "key string, label string",
    )

    def norm(rows):
        # v is nullable in the fixture: sort with an explicit None key
        return sorted(
            ((r["key"], r["v"], r["label"]) for r in rows),
            key=lambda t: (t[0], t[1] is None, t[1] or 0, t[2]),
        )

    plain = norm(fact.join(dim, "key").collect())
    salted = norm(salted_join(fact, dim, on="key", buckets=8).collect())
    assert salted == plain
    # left join preserves unmatched fact rows
    fact2 = fact.union(
        spark.createDataFrame([("orphan", 1, 0.0)], fact.schema)
    )
    left = salted_join(fact2, dim, on="key", buckets=8, how="left")
    orphan = left.filter(F.col("key") == "orphan").collect()
    assert len(orphan) == 1 and orphan[0]["label"] is None
