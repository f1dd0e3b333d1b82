"""hash_embed dim guard (VERDICT_r14 #2): both aggregate forms agree.

The one-aggregate form (dim conditional-sum buffers in a single
groupBy(id)) costs O(dim) per exploded token row, so hash_embed caps
it at _ONE_AGG_MAX_DIM and falls back to the two-stage (id, k) chain
above that. These tests prove the forms are bit-identical — on the
declared dim=64 and on a dim above the threshold — so the guard is a
pure plan-shape choice, never a semantic one.
"""

from __future__ import annotations

import pytest

from vsphere_event_streaming_spark.functions import text as T


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the the the repeated repeated token"),
    (4, ""),  # zero-token doc must keep a zero-vector row
    (5, "sphinx of black quartz judge my vow"),
]


def _embed_rows(spark, dim, force=None):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    if force is None:
        out = T.hash_embed(docs, dim)
    else:
        # Rebuild hash_embed's internals with a chosen cells form so
        # one test run exercises both paths at the SAME dim.
        from pyspark.sql import functions as F

        signed = docs.select(
            "doc_id", F.explode(T.words(F.col("text"))).alias("word")
        ).select(
            "doc_id",
            (T.md5_hash(F.col("word")) % dim).cast("int").alias("k"),
            F.when(
                T.md5_hash(F.concat(F.lit("s:"), F.col("word"))) % 2 == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("sv"),
        )
        cells = force(signed, "doc_id", dim)
        vec = F.array(
            *[
                F.coalesce(F.col(f"__c{i}"), F.lit(0)).cast("double")
                for i in range(dim)
            ]
        )
        zero = F.array(*[F.lit(0.0) for _ in range(dim)])
        out = (
            docs.select("doc_id")
            .join(cells.withColumn("__has", F.lit(1)), "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("__has").isNotNull(), vec)
                .otherwise(zero)
                .alias("embedding"),
            )
        )
    return {r["doc_id"]: r["embedding"] for r in out.collect()}


@pytest.mark.parametrize("dim", [64, 300])
def test_one_agg_and_two_stage_agree(spark, dim):
    one = _embed_rows(spark, dim, force=T._embed_cells_one_agg)
    two = _embed_rows(spark, dim, force=T._embed_cells_two_stage)
    assert one == two
    assert len(one) == len(DOCS)
    assert one[4] == [0.0] * dim  # zero-token doc


def test_dispatch_threshold(spark):
    # Below the ceiling the public function matches the one-agg form;
    # above it, the two-stage form — and both equal each other anyway.
    assert T._ONE_AGG_MAX_DIM == 256
    small = _embed_rows(spark, 64)
    assert small == _embed_rows(spark, 64, force=T._embed_cells_one_agg)
    big = _embed_rows(spark, 300)
    assert big == _embed_rows(spark, 300, force=T._embed_cells_two_stage)
