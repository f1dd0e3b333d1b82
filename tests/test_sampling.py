"""Deterministic sampling + sequence packing invariants (L13/L14).

The oracle rows in selfcheck pin engine parity; these pin the
*semantic* contracts: rerun-stability (the whole point of hash
sampling vs rand()), rate accuracy, and the packing arithmetic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vsphere_event_streaming_spark.functions.sampling import (
    pack_chunked,
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


def test_pack_chunked_properties(spark):
    """VERDICT_r6 #4 contract: (a) every pack holds exactly the
    budget — the stratum's LAST pack excepted; (b) each doc's spans
    partition its tokens (contiguous, start 0, end n); (c) a doc's
    first span lands in the pack pack_sequences assigns it. Fixture
    includes docs LONGER than the budget (must split across ≥3
    packs), a zero-token doc, and exact-boundary docs."""
    budget = 10
    rows = [
        (0, "en", 4),
        (1, "en", 35),   # > 3× budget: spans ≥ 4 packs
        (2, "en", 0),    # zero-token doc keeps one empty span
        (3, "en", 10),   # exactly one budget
        (4, "en", 1),
        (5, "de", 7),
        (6, "de", 7),
        (7, "de", 26),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n long"
    )
    spans = pack_chunked(
        docs, budget, n_tokens_col="n", text_col="n"
    ).collect()
    n_of = {r[0]: r[2] for r in rows}

    # (b) spans partition each doc
    by_doc: dict[int, list] = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_of)
    for doc_id, ss in by_doc.items():
        ss.sort(key=lambda r: r.pack_id)
        assert ss[0].tok_start == 0
        assert ss[-1].tok_end == n_of[doc_id]
        for a, b in zip(ss, ss[1:]):
            assert a.tok_end == b.tok_start
            assert b.pack_id == a.pack_id + 1
        for s in ss[:-1]:
            assert s.tok_end > s.tok_start  # only last span may be empty
    assert len(by_doc[1]) == 4  # 35 tokens from offset 4: packs 0-3

    # (a) every pack == budget except the stratum's last
    per_pack: dict[tuple, int] = {}
    for r in spans:
        k = (r.lang, r.pack_id)
        per_pack[k] = per_pack.get(k, 0) + (r.tok_end - r.tok_start)
    for lang in {r[1] for r in rows}:
        packs = sorted(k[1] for k in per_pack if k[0] == lang)
        assert packs == list(range(len(packs)))  # no gaps in the grid
        for p in packs[:-1]:
            assert per_pack[(lang, p)] == budget, (lang, p)
        assert per_pack[(lang, packs[-1])] <= budget

    # (c) first-span pack == pack_sequences assignment
    whole = {
        r.doc_id: r.pack_id
        for r in pack_sequences(
            docs, budget, n_tokens_col="n", text_col="n"
        ).collect()
    }
    for doc_id, ss in by_doc.items():
        assert min(s.pack_id for s in ss) == whole[doc_id], doc_id


def test_pack_chunked_rejects_bad_budget(spark):
    docs = spark.createDataFrame(
        [(1, "en", 3)], "doc_id long, lang string, n long"
    )
    with pytest.raises(ValueError, match="positive"):
        pack_chunked(docs, 0, n_tokens_col="n")


def test_pack_sequences_rejects_bad_budget(corpus):
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(corpus, 0)


def test_pack_negative_token_counts_clamp_to_empty_span(spark):
    """ADVICE r7: a negative caller-supplied token count must not
    silently invert a span (tok_end < tok_start) or shift later docs'
    offsets — it clamps to the zero-token contract: one empty span,
    and the stream offsets of the following docs are unaffected."""
    docs = spark.createDataFrame(
        [(1, "en", 4), (2, "en", -7), (3, "en", 5)],
        "doc_id long, lang string, n long",
    )
    spans = sorted(
        (r.doc_id, r.pack_id, r.tok_start, r.tok_end)
        for r in pack_chunked(docs, 6, n_tokens_col="n").collect()
    )
    for _, _, s, e in spans:
        assert s <= e, spans
    # doc 2 keeps exactly one EMPTY span; doc 3 starts at offset 4
    # (doc 2 contributes nothing), so it splits 2 + 3 over packs 0/1
    assert spans == [
        (1, 0, 0, 4),
        (2, 0, 0, 0),
        (3, 0, 0, 2),
        (3, 1, 2, 5),
    ], spans
    # the whole-doc packer obeys the same clamp
    whole = {
        r.doc_id: r.pack_id
        for r in pack_sequences(
            docs, 6, n_tokens_col="n", text_col="n"
        ).collect()
    }
    assert whole == {1: 0, 2: 0, 3: 0}


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


def test_weighted_priority_key_monotone_in_weight(spark):
    """q_sample_weighted's max-of-w-uniforms identity (r10): a doc's
    priority key is the MAX over its w draws, so the key must be
    non-decreasing in w for a FIXED doc — the property that makes
    inclusion probability monotone in weight (the ES law) and that
    the ES_WEIGHT_CAP clamp relies on. Checked deterministically by
    computing the running max over draw prefixes for real docs."""
    from pyspark.sql import functions as F

    from vsphere_event_streaming_spark.functions import text as T
    from vsphere_event_streaming_spark.queries.pipeline_queries import (
        ES_SEED,
    )
    from vsphere_event_streaming_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").limit(20)
    draws = F.transform(
        F.sequence(F.lit(1).cast("long"), F.lit(64).cast("long")),
        lambda i: T.md5_hash(
            F.concat(
                F.lit(f"{ES_SEED}:"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                i.cast("string"),
            )
        ),
    )
    rows = docs.select("doc_id", draws.alias("ds")).collect()
    assert rows
    for r in rows:
        running = []
        m = None
        for d in r["ds"]:
            m = d if m is None else max(m, d)
            running.append(m)
        # non-decreasing prefix maxima == key monotone in weight
        assert running == sorted(running)
        # and genuinely increases somewhere (draws are not constant)
        assert running[-1] > running[0]


def test_funnel_stage_sets_are_nested(spark):
    """q_events_funnel (r10): by construction each stage conditions
    on the previous stage's first-touch, so the user sets must nest —
    depth-3 users ⊆ depth-2 ⊆ depth-1 — and every reported stage
    time must be strictly increasing within a row."""
    from vsphere_event_streaming_spark.queries.streaming_queries import (
        q_events_funnel,
    )

    out = q_events_funnel(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        ts = [r["t_view_us"], r["t_click_us"], r["t_purchase_us"]]
        # prefix property: a later stage implies every earlier stage
        seen_null = False
        for t in ts:
            if t is None:
                seen_null = True
            else:
                assert not seen_null, r
        present = [t for t in ts if t is not None]
        assert present == sorted(present)
        assert all(
            present[i] < present[i + 1] for i in range(len(present) - 1)
        ), r
        assert r["depth"] == len(present)


def test_retention_offset_zero_is_cohort_size(spark):
    """q_events_retention (r10): the day_offset=0 cell of every
    cohort must equal the cohort's size (everyone is active on their
    own first day), and no offset cell can exceed it."""
    from collections import defaultdict

    from vsphere_event_streaming_spark.queries.streaming_queries import (
        q_events_retention,
    )

    rows = q_events_retention(spark, "/root/testdata/sf0.001").collect()
    assert rows
    base = {}
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_day_us"]].append(r)
        if r["day_offset"] == 0:
            base[r["cohort_day_us"]] = r["n_users"]
    assert set(base) == set(by_cohort)  # every cohort has its 0-cell
    for c, cells in by_cohort.items():
        for r in cells:
            assert r["day_offset"] >= 0
            assert r["n_users"] <= base[c], r
