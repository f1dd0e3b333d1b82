"""Deterministic sampling + sequence packing invariants (L13/L14).

The oracle rows in selfcheck pin engine parity; these pin the
*semantic* contracts: rerun-stability (the whole point of hash
sampling vs rand()), rate accuracy, and the packing arithmetic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vsphere_event_streaming_spark.functions.sampling import (
    pack_sequences,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(3 + i % 9)),
         ["en", "de", "fr"][i % 3])
        for i in range(600)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).persist()


def test_stratified_sample_is_rerun_stable(corpus):
    """Two evaluations make identical keep decisions — the property
    df.sample()/rand() cannot give across task retries."""
    rates = {"en": 0.5, "de": 0.2}
    ids1 = {r["doc_id"] for r in stratified_sample(corpus, rates).collect()}
    ids2 = {r["doc_id"] for r in stratified_sample(corpus, rates).collect()}
    assert ids1 == ids2 and ids1


def test_stratified_sample_rates_and_default(corpus):
    """Per-stratum fractions track the requested rates; a stratum
    without a rate falls to default_rate (0 = dropped entirely)."""
    rates = {"en": 0.5, "de": 0.2}
    out = stratified_sample(corpus, rates).groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in out}
    assert "fr" not in got  # default_rate=0 drops unlisted strata
    assert 0.35 <= got["en"] / 200 <= 0.65  # 200 en docs, rate 0.5
    assert 0.08 <= got["de"] / 200 <= 0.35  # rate 0.2
    # changing the seed changes the sample, not its size scale
    alt = {
        r["doc_id"]
        for r in stratified_sample(corpus, rates, seed="other").collect()
    }
    base = {r["doc_id"] for r in stratified_sample(corpus, rates).collect()}
    assert alt != base


def test_stratified_sample_rejects_bad_rate(corpus):
    with pytest.raises(ValueError, match="not in \\[0,1\\]"):
        stratified_sample(corpus, {"en": 1.5})


def test_pack_sequences_arithmetic(corpus):
    """Every doc's pack is floor(start_offset / budget) under the
    per-lang doc_id order — recomputed independently in Python."""
    budget = 40
    got = {
        (r["lang"], r["doc_id"]): (r["n_tokens"], r["pack_id"])
        for r in pack_sequences(corpus, budget).collect()
    }
    rows = sorted(
        (r["lang"], r["doc_id"], len(r["text"].split()))
        for r in corpus.collect()
    )
    cum: dict[str, int] = {}
    for lang, doc_id, n_tokens in rows:
        start = cum.get(lang, 0)
        cum[lang] = start + n_tokens
        want = start // budget
        n_got, pack_got = got[(lang, doc_id)]
        assert n_got == n_tokens
        assert pack_got == want, (lang, doc_id, pack_got, want)
    # packs are dense from 0 per lang and every pack holds >= 1 doc
    for lang in cum:
        packs = sorted(
            p for (lg, _), (_, p) in got.items() if lg == lang
        )
        assert packs[0] == 0
        assert set(packs) == set(range(packs[-1] + 1))


def test_pack_sequences_rejects_bad_budget(corpus):
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(corpus, 0)


def test_corpus_split_partition_properties(spark):
    """Split is exhaustive, ~proportional, append-stable (a doc's
    split never changes when the corpus grows), and rejects bad
    fractions."""
    import pytest as _pytest

    from vsphere_event_streaming_spark.functions.sampling import (
        corpus_split,
    )
    from vsphere_event_streaming_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    n = docs.count()
    out = corpus_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n  # exhaustive, no drops/dupes
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert abs(counts["train"] / n - 0.8) < 0.1

    # append stability: splitting HALF the corpus assigns the same
    # labels those docs get in the full corpus
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_map = {r["doc_id"]: r["split"] for r in out.collect()}
    for r in corpus_split(
        half, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect():
        assert full_map[r["doc_id"]] == r["split"]

    with _pytest.raises(ValueError, match="sum to 1"):
        corpus_split(docs, {"train": 0.8, "val": 0.1})
    with _pytest.raises(ValueError, match="negative"):
        corpus_split(docs, {"train": 1.5, "val": -0.5})
