"""Property-based checks (hypothesis) for the log-model invariants.

The reference ships only table-driven goldens (SURVEY §5 "not
present: property-based"); the engine adds them for the two pieces of
bespoke logic where an off-by-one would silently corrupt the API
surface: pagination math and distributed offset assignment.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from vsphere_event_streaming_spark.log.model import (
    PAGE_SIZE,
    assign_offsets,
    get_start,
    last_page,
)


@given(
    earliest=st.integers(min_value=0, max_value=10**6),
    span=st.integers(min_value=0, max_value=10**6),
    page=st.integers(min_value=1, max_value=1000),
)
@settings(max_examples=300, deadline=None)
def test_get_start_properties(earliest, span, page):
    """start is in range and yields ≤ page records up to latest."""
    latest = earliest + span
    start = get_start(earliest, latest, page)
    assert earliest <= start <= latest
    n = latest - start + 1
    assert 1 <= n <= page
    # exactly page records whenever the log holds at least a full page
    if latest - earliest + 1 >= page:
        assert n == page


def test_get_start_empty_sentinel():
    assert get_start(-1, -1, PAGE_SIZE) == -1


def test_assign_offsets_matches_sorted_order(spark):
    """Random (ts, id) rows: offsets are the exact dense global rank.

    One randomized round-trip through the real two-phase
    range-partitioned implementation (seeded, so reproducible) —
    covering ties in ts, sparse ids, and partition-boundary keys.
    """
    rng = random.Random(20240813)
    rows = [
        (rng.randrange(0, 50), i * 7 + rng.randrange(0, 3))
        for i in range(2000)
    ]
    # ensure (ts, id) unique: id component is unique by construction?
    # i*7 + [0,3) can collide between consecutive i — dedup exactly.
    seen: set[tuple[int, int]] = set()
    uniq = [r for r in rows if not (r in seen or seen.add(r))]
    df = spark.createDataFrame(uniq, "ts long, event_id long")
    out = assign_offsets(
        df, order_by=["ts", "event_id"], start=100, num_partitions=8
    ).collect()
    expect = sorted(uniq)
    got = sorted((r["offset"], (r["ts"], r["event_id"])) for r in out)
    assert [g[0] for g in got] == list(range(100, 100 + len(uniq)))
    assert [g[1] for g in got] == expect


def test_sessionize_matches_reference(spark):
    """Randomized gaps-and-islands: the window-function sessionizer in
    q_sessionize agrees with an independent single-pass Python
    reference on random per-user event times (ties included).
    """
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    gap_s = 100
    rng = random.Random(20260813)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(12):
        t = 0
        for _ in range(rng.randrange(1, 120)):
            t += rng.choice([1, 5, 50, 99, 100, 101, 500])
            rows.append((user, base + dt.timedelta(seconds=t), eid))
            eid += 1

    # independent reference: sort per user, split on gap > gap_s
    expect = set()
    by_user: dict[int, list] = {}
    for u, ts, _ in rows:
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        tss.sort()
        start = prev = tss[0]
        n = 1
        for ts in tss[1:]:
            if (ts - prev).total_seconds() > gap_s:
                expect.add((u, start, prev, n))
                start, n = ts, 0
            prev = ts
            n += 1
        expect.add((u, start, prev, n))

    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    flag = F.when(us - F.lag(us).over(w) > gap_s * 1_000_000, 1).otherwise(0)
    running = F.sum(flag).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in (
            df.select("user_id", "ts", running.alias("session_id"))
            .groupBy("user_id", "session_id")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
            )
        ).collect()
    }
    assert got == expect


def test_last_page_matches_get_start(spark):
    """On a dense log (the reference invariant: memlog offsets are
    contiguous in [earliest, latest]; purges only drop a prefix), the
    top-k ``last_page`` returns exactly the offsets
    ``[get_start(earliest, latest, page), latest]``."""
    offsets = list(range(60, 100))  # dense after a purge at 60
    df = spark.createDataFrame([(o,) for o in offsets], "offset long")
    for page in (1, 7, 40, 50):
        got = [r["offset"] for r in last_page(df, page, "offset").collect()]
        start = get_start(60, 99, page)
        assert got == list(range(start, 100))


def test_repeated_spans_report_genuine_equal_spans(spark):
    """Exactness property: every reported span corresponds to words
    that are genuinely identical in both documents at the reported
    positions, and is maximal (cannot extend either direction)."""
    import random as rnd

    from vsphere_event_streaming_spark.functions.dedup import (
        SPAN_K,
        repeated_spans,
    )

    r = rnd.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    shared = [r.choice(vocab) for _ in range(20)]
    docs = []
    for d in range(8):
        words = [r.choice(vocab) for _ in range(r.randint(10, 40))]
        if d % 2 == 0:  # plant the shared run in half the docs
            at = r.randint(0, len(words))
            words = words[:at] + shared + words[at:]
        docs.append((d, " ".join(words)))
    by_id = {d: t.split() for d, t in docs}
    out = repeated_spans(
        spark.createDataFrame(docs, ["doc_id", "text"])
    ).collect()
    assert out, "planted 20-word shared run must be reported"
    for row in out:
        a, b = by_id[row["id_a"]], by_id[row["id_b"]]
        sa, sb, ln = row["start_a"], row["start_b"], row["len_words"]
        assert a[sa : sa + ln] == b[sb : sb + ln], row
        # maximality: the span cannot extend by one word either way
        left_ext = sa > 0 and sb > 0 and a[sa - 1] == b[sb - 1]
        right_ext = (
            sa + ln < len(a)
            and sb + ln < len(b)
            and a[sa + ln] == b[sb + ln]
        )
        assert not left_ext and not right_ext, row
        assert ln >= SPAN_K


def test_boilerplate_scrub_conservation_properties(spark):
    """Conservation properties on a random corpus: no doc is lost,
    kept words are a subsequence of the original, and dropped+kept
    segment counts add up."""
    import random as rnd

    from vsphere_event_streaming_spark.functions.text import (
        boilerplate_scrub,
    )

    r = rnd.Random(11)
    vocab = [f"t{i}" for i in range(40)]
    docs = []
    shared8 = " ".join(r.choice(vocab) for _ in range(8))
    for d in range(10):
        words = " ".join(r.choice(vocab) for _ in range(r.randint(0, 30)))
        text = (shared8 + " " + words) if d % 3 == 0 else words
        docs.append((d, text))
    out = {
        row["doc_id"]: row
        for row in boilerplate_scrub(
            spark.createDataFrame(docs, ["doc_id", "text"])
        ).collect()
    }
    assert set(out) == {d for d, _ in docs}
    for d, text in docs:
        row = out[d]
        orig = text.split()
        kept = row["clean_text"].split()
        # kept words are a subsequence of the original word stream
        it = iter(orig)
        assert all(w in it for w in kept), (d, orig, kept)
        assert 0 <= row["n_dropped"] <= row["n_segs"]
        assert row["n_segs"] == (len(orig) + 7) // 8


@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    rst=st.sampled_from([0, 1, 3]),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_roundtrip_error_bound_property(h, w, seed, rst):
    """For ANY uint8 grayscale image and restart interval, quant=1
    baseline JPEG decode stays within 8 grey levels of the input (the
    DCT rounding bound the multimodal 16-grid gate depends on), and
    16-grid images recover exactly."""
    import numpy as np

    from vsphere_event_streaming_spark.functions import codecs

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img, restart_interval=rst))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() < 8

    cells = ((rng.randint(0, 14, size=(h, w)) + 1) * 16).astype(np.uint8)
    dec16 = codecs.decode_jpeg(
        codecs.encode_jpeg(cells, restart_interval=rst)
    )
    req = ((dec16.astype(np.int64) + 8) // 16) * 16
    assert np.array_equal(req, cells.astype(np.int64))


@given(
    n_frames=st.integers(1, 6),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_avi_container_roundtrip_property(n_frames, h, w, seed):
    """ANY frame list survives the AVI container byte-identically and
    the avih header reports the real frame count and dimensions."""
    import numpy as np

    from vsphere_event_streaming_spark.functions import codecs

    rng = np.random.RandomState(seed)
    frames = [
        codecs.encode_jpeg(
            rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        )
        for _ in range(n_frames)
    ]
    avi = codecs.encode_avi_mjpeg(frames, fps=10)
    hdr = codecs.avi_header(avi)
    assert (hdr["n_frames"], hdr["width"], hdr["height"]) == (
        n_frames, w, h,
    )
    assert codecs.decode_avi_frames(avi) == frames


@given(
    corpus=st.lists(
        st.lists(
            st.text(alphabet="abcde", min_size=1, max_size=6),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=12,
    ),
    k=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=12, deadline=None)
def test_bpe_training_matches_reference_property(spark, corpus, k):
    """Random tiny corpora over a 5-letter alphabet: the Spark trainer
    and per-doc counts must agree with the independent pure-Python
    reference for every corpus and merge budget — the property form of
    test_bpe.py's fixed-corpus parity (tie-break-dense alphabets are
    exactly where a wrong tie order would show)."""
    from tests.test_bpe import ref_learn, ref_tokenize, ref_vocab
    from vsphere_event_streaming_spark.functions.bpe import (
        bpe_token_counts,
        learn_bpe,
        word_vocab,
    )

    texts = [" ".join(ws) for ws in corpus]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = learn_bpe(word_vocab(docs), k)
    want = ref_learn(ref_vocab(texts), k)
    assert got == want
    out = {
        r.doc_id: (r.n_words, r.bpe_tokens)
        for r in bpe_token_counts(docs, got).collect()
    }
    import re as _re

    for i, t in enumerate(texts):
        ws = _re.findall(r"[a-z]+", t.lower())
        assert out[i] == (
            len(ws),
            sum(len(ref_tokenize(w, want)) for w in ws),
        )
