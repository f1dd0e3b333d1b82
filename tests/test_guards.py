"""Typed-error and data-quality guards (ADVICE r5 low-severity items).

Three contracts hardened this round:

- ``decode_jpeg`` raises the module's documented ``ValueError`` on
  truncation anywhere — segment table OR mid-entropy-stream — never
  ``struct.error``/``IndexError`` (parity with ``jpeg_header``'s
  guards);
- ``encode_jpeg`` refuses ``subsampling='420'`` for grayscale input
  instead of silently falling back to 4:4:4;
- ``binned_range_join`` drops empty/inverted intervals BEFORE binning,
  so a data-quality row yields zero rows instead of a descending
  ``sequence()`` bin explosion.
"""

from __future__ import annotations

import numpy as np
import pytest

from vsphere_event_streaming_spark.functions import codecs


def _sample_jpeg() -> bytes:
    rng = np.random.RandomState(7)
    img = ((rng.randint(0, 14, size=(32, 32)) + 1) * 16).astype(np.uint8)
    return codecs.encode_jpeg(img)


def test_decode_jpeg_truncated_segment_header_is_typed():
    payload = _sample_jpeg()
    # cut inside a marker segment's 4-byte header (marker + length)
    cut = payload[:3]
    with pytest.raises(ValueError):
        codecs.decode_jpeg(cut)


def test_decode_jpeg_truncated_segment_body_is_typed():
    payload = _sample_jpeg()
    # cut mid-way through the first DQT body: the declared seg_len
    # overruns the buffer -> typed error, not a short slice
    dqt = payload.find(b"\xff\xdb")
    assert dqt > 0
    with pytest.raises(ValueError):
        codecs.decode_jpeg(payload[: dqt + 10])


def test_decode_jpeg_truncated_entropy_stream_is_typed():
    payload = _sample_jpeg()
    sos = payload.find(b"\xff\xda")
    assert sos > 0
    (seg_len,) = np.frombuffer(
        payload[sos + 2 : sos + 4], dtype=">u2"
    )
    entropy_start = sos + 2 + int(seg_len)
    # keep only 2 entropy bytes of a 16-block scan: the bit reader
    # starves mid-block and must raise ValueError, not IndexError
    cut = payload[: entropy_start + 2]
    with pytest.raises(ValueError):
        codecs.decode_jpeg(cut)


def test_decode_jpeg_truncation_sweep_never_untypeds():
    """Every truncation point raises ValueError or NotImplementedError
    — no struct.error / IndexError anywhere in the prefix lattice."""
    payload = _sample_jpeg()
    for cut in range(2, len(payload), 7):
        try:
            codecs.decode_jpeg(payload[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_encode_jpeg_rejects_grayscale_420():
    img = np.zeros((16, 16), dtype=np.uint8)
    with pytest.raises(ValueError, match="420"):
        codecs.encode_jpeg(img, subsampling="420")
    # color 420 still works and roundtrips
    rgb = np.zeros((16, 16, 3), dtype=np.uint8) + 128
    dec = codecs.decode_jpeg(codecs.encode_jpeg(rgb, subsampling="420"))
    assert dec.shape == (16, 16, 3)


def test_binned_range_join_drops_inverted_intervals(spark):
    """An interval with hi <= lo (empty or inverted) must contribute
    ZERO candidate pairs — and, critically, must not explode onto a
    descending bin sequence before the residual filter runs."""
    from pyspark.sql import functions as F

    from vsphere_event_streaming_spark.operators.joins import (
        binned_range_join,
    )

    points = spark.createDataFrame(
        [(i, f"2024-01-01 00:{i:02d}:00") for i in range(10)],
        "pid long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    intervals = spark.createDataFrame(
        [
            # healthy: covers minutes 2-4
            (1, "2024-01-01 00:02:00", "2024-01-01 00:05:00"),
            # inverted: hi far before lo — would be a ~huge descending
            # sequence() without the guard
            (2, "2024-01-01 00:08:00", "2023-01-01 00:00:00"),
            # empty: hi == lo
            (3, "2024-01-01 00:03:00", "2024-01-01 00:03:00"),
            # NULL hi
            (4, "2024-01-01 00:01:00", None),
        ],
        "iid long, lo string, hi string",
    ).withColumn("lo", F.to_timestamp("lo")).withColumn(
        "hi", F.to_timestamp("hi")
    )
    out = binned_range_join(
        points, intervals, "ts", "lo", F.col("hi"), bin_seconds=60
    )
    got = {(r.pid, r.iid) for r in out.collect()}
    assert got == {(2, 1), (3, 1), (4, 1)}


def test_asof_join_keyless_requires_opt_in(spark):
    """VERDICT_r5 'What's wrong' #2: the monotonically_increasing_id
    row-identity fallback is retry-nondeterministic — a keyless call
    must raise unless the caller explicitly accepts that."""
    from pyspark.sql import functions as F

    from vsphere_event_streaming_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-02")], "k long, t string"
    ).withColumn("t", F.to_timestamp("t"))
    right = spark.createDataFrame(
        [(1, "2024-01-01", "a")], "rk long, rt string, v string"
    ).withColumn("rt", F.to_timestamp("rt"))
    with pytest.raises(ValueError, match="retry-nondeterministic"):
        asof_join(left, right, "k", "rk", "t", "rt")
    out = asof_join(
        left, right, "k", "rk", "t", "rt", allow_unkeyed=True
    ).collect()
    assert len(out) == 1 and out[0].v == "a"


def test_asof_nearest_direction_and_ties(spark):
    """The r13 'nearest' direction: picks the closest right row in
    EITHER time direction by exact integer-microsecond distance;
    equidistant ties prefer the EARLIER right_time then the caller's
    tiebreakers; the exclusive tolerance drops matches at exactly the
    bound; unmatched left rows keep NULLs."""
    from pyspark.sql import functions as F

    from vsphere_event_streaming_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [
            (1, 10, "2024-01-10 00:00:00"),  # nearest is AFTER (d=1)
            (2, 10, "2024-01-02 00:00:00"),  # nearest is BEFORE (d=1)
            (3, 10, "2024-01-06 00:00:00"),  # equidistant 01/01 vs 01/11
            (4, 99, "2024-01-05 00:00:00"),  # no right rows at all
        ],
        "eid long, k long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (10, 100, "2024-01-01 00:00:00"),
            (10, 200, "2024-01-11 00:00:00"),
        ],
        "rk long, rid long, rts string",
    ).withColumn("rts", F.to_timestamp("rts"))

    out = {
        r["eid"]: r["rid"]
        for r in asof_join(
            left,
            right,
            left_on="k",
            right_on="rk",
            left_time="ts",
            right_time="rts",
            tiebreakers=["rid"],
            left_key="eid",
            direction="nearest",
        ).collect()
    }
    # eid 1: 01-10 → 01-11 (d=1) beats 01-01 (d=9); eid 2: mirrored;
    # eid 3: equidistant (d=5 both) → EARLIER right_time wins (rid 100)
    assert out == {1: 200, 2: 100, 3: 100, 4: None}

    # exclusive tolerance: a 5-day bound excludes eid 3's d=5 matches
    out_tol = {
        r["eid"]: r["rid"]
        for r in asof_join(
            left,
            right,
            left_on="k",
            right_on="rk",
            left_time="ts",
            right_time="rts",
            tiebreakers=["rid"],
            left_key="eid",
            direction="nearest",
            tolerance="5 days",
        ).collect()
    }
    assert out_tol == {1: 200, 2: 100, 3: None, 4: None}
