"""Multimodal columns (SURVEY §2.11 L5).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct (schemas.MEDIA_META). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages.

Decoding is REAL for the formats :mod:`codecs` implements library-free
(PNG full pixel decode incl. all five unfilter types, JPEG header,
PCM WAV) — ``decode_image`` / ``resize_images`` / ``audio_features``
dispatch on magic bytes. The deterministic ``fake=True`` path remains
for synthetic payloads that are not real media bytes (the container
ships no media *files*, so tests/queries synthesize real PNG/WAV bytes
with the same codecs). Formats beyond the pure-Python boundary (JPEG
pixel decode, compressed audio, video containers) raise — an honest
capability edge, never a guess.

At 100 TB: payloads stay in parquet binary columns, scanned with
column pruning (metadata-only queries never read payload bytes);
mapInPandas batches bound memory to Arrow batch size × executor cores.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import codecs

META_SCHEMA = (
    "media_id long, byte_len long, sha256 string, width int, height int"
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Test-harness helper: synthesize a binary payload column from a
    text column (the container has no real media files)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode an image payload's header to (width, height, ...).

    The real path sniffs magic bytes and parses PNG IHDR / JPEG SOFn
    (:mod:`codecs`); unknown formats raise ``ValueError``. ``fake=True``
    instead derives deterministic pseudo-dimensions from the payload
    bytes — for synthetic non-media payloads in plumbing tests.
    """
    if not fake:
        return codecs.sniff_image(payload)
    if not payload:
        return {"width": 0, "height": 0}
    return {
        "width": int(payload[0] % 64) + 1,
        "height": int(payload[min(1, len(payload) - 1)] % 64) + 1,
    }


def synth_png_payloads(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(media_id, payload): a REAL PNG per row, deterministically
    derived from the text — dims ``(len%64+1, (len*7)%64+1)``, solid
    gray fill ``(len*13)%256``. The encoder rotates scanline filters,
    so decoding these payloads exercises every PNG unfilter path.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                t = t if isinstance(t, str) else ""
                w = len(t) % 64 + 1
                h = (len(t) * 7) % 64 + 1
                v = (len(t) * 13) % 256
                payloads.append(
                    codecs.encode_png(np.full((h, w), v, dtype=np.uint8))
                )
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


IMAGE_META_SCHEMA = (
    "media_id long, format string, width int, height int, "
    "bit_depth int, channels int, avg_pixel double"
)


def extract_image_meta(media: DataFrame) -> DataFrame:
    """REAL image decode over (media_id, payload) via mapInPandas:
    header fields from the chunk/marker walk plus ``avg_pixel`` from
    the fully unfiltered pixel array — the value only a correct
    inflate+unfilter produces.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "format", "width", "height",
                "bit_depth", "channels", "avg_pixel",
            )}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                hdr = codecs.sniff_image(bytes(p))
                rows["media_id"].append(mid)
                rows["format"].append(hdr["format"])
                rows["width"].append(hdr["width"])
                rows["height"].append(hdr["height"])
                rows["bit_depth"].append(hdr["bit_depth"])
                rows["channels"].append(hdr["channels"])
                rows["avg_pixel"].append(
                    float(np.mean(codecs.decode_png(bytes(p))))
                    if hdr["format"] == "png"
                    else None
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def extract_metadata(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas metadata extraction over (media_id, payload).

    One Arrow batch in, one out; runs on executors, never collects.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_image(p, fake=fake_decode) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "sha256": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "width": [d["width"] for d in dims],
                    "height": [d["height"] for d in dims],
                }
            )

    return media.mapInPandas(run, schema=META_SCHEMA)


RESIZED_SCHEMA = "media_id long, payload binary, width int, height int"


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    fake_decode: bool = True,
) -> DataFrame:
    """mapInPandas image resize: (media_id, payload) → resized payload
    + dims. PNG payloads resize for REAL: full decode → nearest-
    neighbor resample → re-encode (:mod:`codecs`). The fake path emits
    a deterministic truncation of non-media bytes so plumbing stays
    testable; other real formats raise. Arrow moves the payload bytes —
    no per-row Python pickling.
    """

    def _resize_png(p: bytes) -> bytes:
        px = codecs.decode_png(p)
        h, w = px.shape[:2]
        yi = np.arange(target_h) * h // target_h
        xi = np.arange(target_w) * w // target_w
        return codecs.encode_png(px[yi][:, xi])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            for p in pdf["payload"]:
                p = bytes(p) if p is not None else None
                if p and p.startswith(codecs.PNG_MAGIC):
                    out_payload.append(_resize_png(p))
                elif fake_decode:
                    # fake resize: keep target_w/64ths of the payload
                    # (64 = the fake codec's max width, decode_image)
                    out_payload.append(
                        p[: max(1, len(p) * target_w // 64)] if p else p
                    )
                else:
                    raise NotImplementedError(
                        "real resize supports PNG only; other codecs "
                        "need an imaging library"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_samples long, rms double, zero_crossings long"
)


def audio_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas audio feature extraction (RMS energy, zero-crossing
    count) over (media_id, payload).

    RIFF/WAVE payloads decode for REAL (PCM 8/16-bit, :mod:`codecs`);
    the fake path interprets non-media bytes as unsigned 8-bit samples
    so plumbing stays testable without media files. Either way the
    numpy-vectorized feature math and Arrow batch path are identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n, rms, zc = [], [], []
            for p in pdf["payload"]:
                if not p:
                    n.append(0)
                    rms.append(0.0)
                    zc.append(0)
                    continue
                p = bytes(p)
                if p[:4] == b"RIFF":
                    _hdr, x = codecs.decode_wav(p)
                    x = x.reshape(-1)  # features over interleaved chans
                elif fake_decode:
                    x = (
                        np.frombuffer(p, dtype=np.uint8).astype("float64")
                        - 128.0
                    )
                else:
                    raise NotImplementedError(
                        "real audio decode supports PCM WAV only"
                    )
                n.append(len(x))
                rms.append(float(np.sqrt(np.mean(x * x))))
                # true sign transitions only: zero samples are not
                # crossings (naive diff(sign) counts +1,0,+1 as two)
                s = np.sign(x)
                s = s[s != 0]
                zc.append(
                    int(np.count_nonzero(s[1:] != s[:-1])) if len(s) else 0
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": n,
                    "rms": rms,
                    "zero_crossings": zc,
                }
            )

    return media.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explodes a per-media frame index
    using metadata only (no payload read — column pruning keeps the
    scan narrow). The actual frame decode is the stubbed codec above.
    """
    # one frame per started interval: ceil(duration/every) frames at
    # t = 0, every, ... < duration; zero/negative duration → no frames
    n_frames = F.ceil(F.col("meta.duration_ms") / every_ms).cast("int")
    return media.filter(n_frames > 0).select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )


EMBED_SCHEMA = "chunk_key string, embedding array<float>"


def embed_chunks(
    chunks: DataFrame,
    key_col: str = "chunk_key",
    text_col: str = "chunk_text",
    dim: int = 16,
    batch_size: int = 64,
) -> DataFrame:
    """mapInPandas embedding-inference stage over text chunks.

    The Spark-side plumbing of a model-inference step (the stage that
    follows q_chunk_text in a RAG/pre-training pipeline): Arrow moves
    text batches into Python, the 'model' maps each batch to fixed-dim
    vectors, vectors return as ``array<float>``. The model itself is a
    deterministic stub (md5-seeded pseudo-vector per the environment
    rules — no ML libs in this container): swap ``_embed_batch`` for a
    real encoder; everything else (schema, batch shape, partition
    parallelism, memory bounds) is production-real. ``batch_size``
    sub-batches inside each Arrow batch the way a GPU encoder would.
    """
    def _embed_batch(texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            # null text embeds as empty (a real encoder would do the
            # same or filter upstream; crashing the job is never right)
            h = hashlib.md5(("" if t is None else t).encode()).digest()
            out.append(
                [((h[i % 16] / 255.0) * 2 - 1) for i in range(dim)]
            )
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                part = pdf.iloc[lo : lo + batch_size]
                yield pd.DataFrame(
                    {
                        "chunk_key": part[key_col].values,
                        "embedding": _embed_batch(
                            part[text_col].tolist()
                        ),
                    }
                )

    return chunks.select(key_col, text_col).mapInPandas(
        run, schema=EMBED_SCHEMA
    )


# ----------------------------------------------------------------------
# L22: perceptual image hash (dHash) through the REAL PNG roundtrip
# ----------------------------------------------------------------------
#: Cell-image grid for the perceptual hash: 7x9 pixels -> 7 rows of 8
#: horizontal-gradient bits = a 56-bit dHash that fits signed int64
#: in every engine (the classic 8x9 grid's 64th bit would overflow).
PHASH_GRID_H = 7
PHASH_GRID_W = 9

_PHASH_MOD = 1_000_000_007


def _h60(s: str) -> int:
    """Python replica of functions.text.md5_hash (verified equal)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _PHASH_MOD


def _cell_image(text: str, _h60_cache: dict | None = None) -> np.ndarray:
    """Deterministic bag-of-words cell image: cell k accumulates the
    60-bit hashes of its (word, count) pairs, mod 256. Pure modular
    arithmetic — the same image is replayable in SQL, which is what
    makes the PNG-roundtrip phash oracle-checkable.

    ``_h60_cache`` (optional) memoizes the md5-derived hash per
    (word / word:count) string for the lifetime of the dict the caller
    passes — the synth mapInPandas stages hand in one dict per TASK
    (heavyweight-state-per-task, guide §4.5): the corpus vocabulary
    repeats across a task's documents and the md5 calls dominate the
    cell arithmetic. Pure memoization of a pure function — values are
    identical with or without it, and nothing outlives the task."""
    import re as _re
    from collections import Counter

    # replicate _DUCK_WORDS exactly: split on the 6-char class and
    # filter empties — NO Python .strip(), which eats Unicode
    # whitespace (\xa0,  ...) that neither engine's split class
    # matches and would diverge the tokens from the oracle's
    ws = [
        w for w in _re.split(r"[ \t\n\r\f\x0B]+", text or "") if w
    ]
    if _h60_cache is None:
        h60 = _h60
    else:
        def h60(s: str) -> int:
            v = _h60_cache.get(s)
            if v is None:
                v = _h60_cache[s] = _h60(s)
            return v

    n = PHASH_GRID_H * PHASH_GRID_W
    cells = [0] * n
    for w, cnt in Counter(ws).items():
        cells[h60(w) % n] += h60(f"{w}:{cnt}")
    return np.array([c % 256 for c in cells], dtype=np.uint8).reshape(
        PHASH_GRID_H, PHASH_GRID_W
    )


#: dHash bit weights: bit r*8+c for cell (r, c) — precomputed so the
#: hash is one vectorized compare + dot instead of a 56-iteration
#: Python loop per image.
_DHASH_WEIGHTS = (
    np.int64(1)
    << (
        8 * np.arange(PHASH_GRID_H, dtype=np.int64)[:, None]
        + np.arange(PHASH_GRID_W - 1, dtype=np.int64)[None, :]
    )
)


def dhash_bits(px: np.ndarray) -> int:
    """dHash over a (7, 9) grayscale grid: bit r*8+c = [px[r,c] <
    px[r,c+1]] — the standard horizontal-gradient perceptual hash."""
    return int((_DHASH_WEIGHTS * (px[:, :-1] < px[:, 1:])).sum())


def synth_cell_png_payloads(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(media_id, payload): a REAL PNG per row encoding the doc's
    bag-of-words cell image. The encoder rotates scanline filters, so
    these payloads exercise every PNG filter path on decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        h60_cache: dict = {}  # per-task word-hash memo (§4.5)
        for pdf in batches:
            payloads = [
                codecs.encode_png(_cell_image(t, h60_cache))
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


#: Cell-value grid step for the JPEG phash gate. JPEG at quant=1 loses
#: at most ~7.9 grey levels per pixel (64 DCT coefficients each rounded
#: by <=0.5, summed against basis amplitude (1/4)(1/sqrt(2)+7)^2 ~ 14.85,
#: plus the final 0.5 pixel rounding) — strictly under step/2 = 8, so
#: re-quantizing the decoded pixels to the 16-grid recovers every cell
#: EXACTLY and the dHash stays oracle-replayable despite the lossy DCT.
JPEG_CELL_STEP = 16
#: Cells take values (h % 14 + 1) * 16 ∈ {16..224}: offset from 0/255
#: so codec error cannot clamp, 14 distinct levels for hash entropy.
JPEG_CELL_LEVELS = 14
#: Restart interval for the synthesized JPEGs: 2 MCUs per 7x9 image =
#: one RST marker mid-stream, so every decode exercises the restart
#: path (DC predictor reset + byte-realign) real crawl JPEGs hit.
JPEG_CELL_RST = 1


def _cell_image16(
    text: str, _h60_cache: dict | None = None
) -> np.ndarray:
    """The bag-of-words cell image on the 16-spaced grid (see
    JPEG_CELL_STEP): same modular arithmetic as ``_cell_image`` with a
    final (v % 14 + 1) * 16 mapping the oracle replays in SQL."""
    cells = _cell_image(text, _h60_cache).astype(np.int64)
    return ((cells % JPEG_CELL_LEVELS + 1) * JPEG_CELL_STEP).astype(
        np.uint8
    )


def synth_cell_jpeg_payloads(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(media_id, payload): a REAL baseline JPEG per row encoding the
    doc's 16-spaced cell image — frequency-optimized Huffman tables,
    quant=1, restart markers — so a decode exercises the full T.81
    baseline path (DHT rebuild, entropy decode, RST resync, IDCT)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        h60_cache: dict = {}  # per-task word-hash memo (§4.5)
        for pdf in batches:
            payloads = [
                codecs.encode_jpeg(
                    _cell_image16(t, h60_cache),
                    restart_interval=JPEG_CELL_RST,
                )
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


#: Synthesized MJPEG-AVI layout: 5 frames at 10 fps = 500 ms clips;
#: frame f's cell image is ((raw + f) % 14 + 1) * 16 — the same
#: oracle-replayable modular arithmetic, shifted per frame so every
#: frame hashes differently and a mis-ordered or mis-sampled frame is
#: a value mismatch, not a coincidence.
VIDEO_FRAMES = 5
VIDEO_FPS = 10


def _cell_image16_frame(text: str, frame: int) -> np.ndarray:
    cells = _cell_image(text).astype(np.int64)
    return _frame_cells16(cells, frame)


def _frame_cells16(cells: np.ndarray, frame: int) -> np.ndarray:
    """Frame f's 16-spaced grid from the RAW (mod-256) cell image —
    split out so the AVI synth computes the word-hash image once per
    doc instead of once per frame."""
    return (
        ((cells + frame) % JPEG_CELL_LEVELS + 1) * JPEG_CELL_STEP
    ).astype(np.uint8)


def synth_cell_avi_payloads(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(media_id, payload): a REAL MJPEG-in-AVI clip per row — RIFF
    container (avih/strl headers + movi '00dc' chunks), each frame a
    real baseline JPEG of the doc's frame-shifted cell image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        h60_cache: dict = {}  # per-task word-hash memo (§4.5)
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                cells = _cell_image(t, h60_cache).astype(np.int64)
                frames = [
                    codecs.encode_jpeg(
                        _frame_cells16(cells, f),
                        restart_interval=JPEG_CELL_RST,
                    )
                    for f in range(VIDEO_FRAMES)
                ]
                payloads.append(
                    codecs.encode_avi_mjpeg(frames, fps=VIDEO_FPS)
                )
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def video_frame_hashes(
    media: DataFrame, every_ms: int = 1000, on_error: str = "fail"
) -> DataFrame:
    """(media_id, frame_idx, phash): REAL video frame sampling.

    Walks each payload's RIFF structure (avi_header for timing,
    decode_avi_frames for the '00dc' stream), samples one frame per
    started ``every_ms`` interval — the sampled index is
    t·1000 / us_per_frame, exactly what frame_sample_plan computes
    from metadata — decodes each sampled JPEG through the full T.81
    path, re-quantizes to the 16-grid, and dHashes. This is the
    decode-backed realization of frame_sample_plan's metadata-only
    plan: same sampling rule, real pixels.

    Scale shape: one Arrow-batched mapInPandas stage, no shuffle;
    output is (sampled frames)×16 bytes per clip. ``on_error`` as in
    phash_images."""
    if on_error not in ("fail", "null"):
        raise ValueError(f"on_error must be 'fail' or 'null': {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            hashes: list[int | None] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    payload = bytes(p)
                    hdr = codecs.avi_header(payload)
                    frames = codecs.decode_avi_frames(payload)
                    uspf = hdr["us_per_frame"]
                    sampled = sorted(
                        {
                            min(t * 1000 // uspf, len(frames) - 1)
                            for t in range(
                                0, hdr["duration_ms"], every_ms
                            )
                        }
                    )
                    for fi in sampled:
                        px = codecs.decode_jpeg(frames[fi]).astype(
                            np.int64
                        )
                        step = JPEG_CELL_STEP
                        px = ((px + step // 2) // step) * step
                        ids.append(mid)
                        idxs.append(fi)
                        hashes.append(dhash_bits(px))
                except Exception:
                    if on_error == "fail":
                        raise
                    ids.append(mid)
                    idxs.append(-1)
                    hashes.append(None)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "phash": hashes},
            ).astype({"phash": "Int64"})

    return media.mapInPandas(
        run, schema="media_id long, frame_idx int, phash long"
    )


def phash_images(
    media: DataFrame, on_error: str = "fail", quantize_step: int = 0
) -> DataFrame:
    """(media_id, phash): dHash of each payload's DECODED pixels.

    The decode is the real codec walk (PNG inflate+unfilter or JPEG
    Huffman+IDCT, dispatched by magic bytes) — so when the oracle
    recomputes the same hash from the cell arithmetic alone, agreement
    proves the entire encode->decode roundtrip recovers every cell on
    every row. A broken filter/Huffman path shows up as a value-hash
    mismatch, not a silent wrong answer.

    ``on_error``: ``"fail"`` (default — a corrupt payload raises and
    fails the task, right for oracle-checked runs) or ``"null"`` —
    undecodable rows yield a NULL phash instead of killing the job,
    the posture a 100 TB crawl needs where some media bytes are
    always garbage; count the NULLs downstream and quarantine.

    ``quantize_step`` > 0 re-quantizes decoded pixels to the nearest
    multiple before hashing — the lossy-codec form of the gate: JPEG
    at quant=1 loses < step/2 grey levels, so cells synthesized on a
    step-spaced grid (synth_cell_jpeg_payloads) recover EXACTLY and
    the hash stays oracle-replayable despite the DCT.
    """
    if on_error not in ("fail", "null"):
        raise ValueError(f"on_error must be 'fail' or 'null': {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes: list[int | None] = []
            for p in pdf["payload"]:
                try:
                    px = codecs.decode_image_pixels(bytes(p))
                    if quantize_step:
                        px = (
                            (px.astype(np.int64) + quantize_step // 2)
                            // quantize_step
                        ) * quantize_step
                    hashes.append(dhash_bits(px))
                except Exception:
                    if on_error == "fail":
                        raise
                    hashes.append(None)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": hashes},
            ).astype({"phash": "Int64"})

    return media.mapInPandas(run, schema="media_id long, phash long")


# ----------------------------------------------------------------------
# L23: audio fingerprint through the REAL WAV (RIFF/PCM16) roundtrip
# ----------------------------------------------------------------------
#: Frame layout for the audio fingerprint: 57 frames x 8 samples ->
#: 56 energy-delta bits, fitting signed int64 like the image dHash.
AUDIO_FRAMES = 57
AUDIO_FRAME_LEN = 8


def _text_samples(text: str) -> np.ndarray:
    """Deterministic int16 'audio' from a doc: sample i is
    ((codepoint_i mod 256) - 128) * 256 over the first 456 characters
    — pure arithmetic on the text, so the SQL oracle replays it
    exactly. The mod 256 keeps any Unicode codepoint (CJK docs) inside
    int16; without it ord('的')=30340 would overflow the dtype while
    the oracle computed the unwrapped value."""
    n = AUDIO_FRAMES * AUDIO_FRAME_LEN
    t = (text or "")[:n]
    try:
        # vectorized codepoint extraction: UTF-32-LE code units ARE the
        # codepoints, so one encode replaces the per-char ord() loop
        cp = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(
            np.int64
        )
    except UnicodeEncodeError:  # pragma: no cover - lone surrogates
        cp = np.array([ord(c) for c in t], dtype=np.int64)
    return (((cp % 256) - 128) * 256).astype(np.int16)


#: Energy-delta bit weights: bit j = 1 << j over the 56 frame deltas.
_AUDIO_FP_WEIGHTS = np.int64(1) << np.arange(
    AUDIO_FRAMES - 1, dtype=np.int64
)


def audio_fp_bits(samples: np.ndarray) -> int:
    """Energy-delta fingerprint: frame energy = sum |s| over 8-sample
    frames (missing samples contribute 0); bit j = [e_j < e_{j+1}].
    The spectral-fingerprint shape (Shazam-style sign-of-delta over
    banded energies) reduced to one band so it stays integer-exact."""
    n = AUDIO_FRAMES * AUDIO_FRAME_LEN
    s = np.zeros(n, dtype=np.int64)
    clipped = np.abs(samples[:n].astype(np.int64))
    s[: len(clipped)] = clipped
    e = s.reshape(AUDIO_FRAMES, AUDIO_FRAME_LEN).sum(axis=1)
    return int((_AUDIO_FP_WEIGHTS * (e[:-1] < e[1:])).sum())


def synth_wav_payloads(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(media_id, payload): a REAL RIFF/PCM16 WAV per row from the
    doc's deterministic sample stream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                codecs.encode_wav(_text_samples(t)) for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def audio_fingerprints(
    media: DataFrame, on_error: str = "fail"
) -> DataFrame:
    """(media_id, afp): energy-delta fingerprint of each payload's
    DECODED samples. The decode is the real RIFF chunk walk + PCM16
    read; the oracle recomputes the fingerprint from the text
    arithmetic alone, so agreement proves the WAV encode->decode
    roundtrip sample-exact on every row — the audio twin of
    :func:`phash_images`, including its ``on_error`` policy."""
    if on_error not in ("fail", "null"):
        raise ValueError(f"on_error must be 'fail' or 'null': {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps: list[int | None] = []
            for p in pdf["payload"]:
                try:
                    _, x = codecs.decode_wav(bytes(p))
                    fps.append(audio_fp_bits(x.astype(np.int64)))
                except Exception:
                    if on_error == "fail":
                        raise
                    fps.append(None)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "afp": fps},
            ).astype({"afp": "Int64"})

    return media.mapInPandas(run, schema="media_id long, afp long")


# ----------------------------------------------------------------------
# Fused synth→decode roundtrips (r14 optimization round)
# ----------------------------------------------------------------------
# Each helper below is the exact composition of a synth_* payload stage
# with its decode/feature stage, run inside ONE Arrow mapInPandas
# function. The per-row codec walk is UNCHANGED — the same real bytes
# are encoded and then decoded by the same full codec path — but the
# payload no longer makes a JVM→Python→JVM round trip between the two
# halves, and the query plan carries one Python stage instead of two.
# Measured motivation (guide §4.1 "you control how many times columns
# cross"): at sf0.1 an *identity* mapInPandas over the documents table
# costs ~0.45 s wall (32-task launch + Arrow exchange) while the
# entire optimized decode compute is smaller than that — the second
# Python stage was pure boundary overhead.


def synth_cell_png_phash(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(media_id, phash): synth_cell_png_payloads ∘ phash_images in
    one Arrow stage — real PNG encode (rotating filters) then the full
    inflate+unfilter decode and dHash, per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        h60_cache: dict = {}  # per-task word-hash memo (§4.5)
        for pdf in batches:
            hashes = []
            for t in pdf[text_col]:
                payload = codecs.encode_png(_cell_image(t, h60_cache))
                px = codecs.decode_image_pixels(payload)
                hashes.append(dhash_bits(px))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "phash": hashes}
            ).astype({"phash": "Int64"})

    return df.select(id_col, text_col).mapInPandas(
        run, schema="media_id long, phash long"
    )


def synth_cell_jpeg_phash(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(media_id, phash): synth_cell_jpeg_payloads ∘
    phash_images(quantize_step=JPEG_CELL_STEP) in one Arrow stage —
    real baseline-JPEG encode (optimized Huffman tables, RST markers)
    then the full T.81 decode, 16-grid re-quantize, and dHash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        h60_cache: dict = {}  # per-task word-hash memo (§4.5)
        step = JPEG_CELL_STEP
        for pdf in batches:
            hashes = []
            for t in pdf[text_col]:
                payload = codecs.encode_jpeg(
                    _cell_image16(t, h60_cache),
                    restart_interval=JPEG_CELL_RST,
                )
                px = codecs.decode_image_pixels(payload)
                px = (
                    (px.astype(np.int64) + step // 2) // step
                ) * step
                hashes.append(dhash_bits(px))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "phash": hashes}
            ).astype({"phash": "Int64"})

    return df.select(id_col, text_col).mapInPandas(
        run, schema="media_id long, phash long"
    )


def _avi_clip_hash_walk(
    t: str, h60_cache: dict, every_ms: int
) -> tuple[list[int], list[int]]:
    """One doc's full synth→decode AVI walk: real MJPEG-AVI encode
    (one baseline JPEG per frame), container walk, sampling rule,
    per-sampled-frame T.81 decode and dHash. Returns the sampled
    ``(frame_idx, phash)`` pair lists in ascending frame order —
    shared by the per-frame and per-clip synth stages so the two
    can never drift."""
    step = JPEG_CELL_STEP
    cells = _cell_image(t, h60_cache).astype(np.int64)
    payload = codecs.encode_avi_mjpeg(
        [
            codecs.encode_jpeg(
                _frame_cells16(cells, f),
                restart_interval=JPEG_CELL_RST,
            )
            for f in range(VIDEO_FRAMES)
        ],
        fps=VIDEO_FPS,
    )
    hdr = codecs.avi_header(payload)
    frames = codecs.decode_avi_frames(payload)
    uspf = hdr["us_per_frame"]
    sampled = sorted(
        {
            min(t_ms * 1000 // uspf, len(frames) - 1)
            for t_ms in range(0, hdr["duration_ms"], every_ms)
        }
    )
    fs: list[int] = []
    hs: list[int] = []
    for fi in sampled:
        px = codecs.decode_jpeg(frames[fi]).astype(np.int64)
        px = ((px + step // 2) // step) * step
        fs.append(fi)
        hs.append(dhash_bits(px))
    return fs, hs


def synth_cell_avi_frame_hashes(
    df: DataFrame, id_col: str, text_col: str, every_ms: int = 1000
) -> DataFrame:
    """(media_id, frame_idx, phash): synth_cell_avi_payloads ∘
    video_frame_hashes in one Arrow stage — real MJPEG-AVI encode
    (one baseline JPEG per frame), then the container walk, sampling
    rule, per-sampled-frame T.81 decode and dHash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        h60_cache: dict = {}  # per-task word-hash memo (§4.5)
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            hashes: list[int] = []
            for mid, t in zip(pdf[id_col], pdf[text_col]):
                fs, hs = _avi_clip_hash_walk(t, h60_cache, every_ms)
                ids.extend(mid for _ in fs)
                idxs.extend(fs)
                hashes.extend(hs)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "phash": hashes},
            ).astype({"phash": "Int64"})

    return df.select(id_col, text_col).mapInPandas(
        run, schema="media_id long, frame_idx int, phash long"
    )


def synth_cell_avi_clip_hashes(
    df: DataFrame, id_col: str, text_col: str, every_ms: int = 1000
) -> DataFrame:
    """(media_id, fs, hs): the SAME walk as
    :func:`synth_cell_avi_frame_hashes` emitting ONE row per clip —
    the sampled frame indices and their dHashes as parallel arrays in
    ascending frame order (r15, guide §2.4): the clip-pairing
    consumer (q_dedup_video) needs per-clip frame sets, and emitting
    them pre-grouped from the Arrow stage removes the groupBy
    exchange a per-frame table would need, shrinks the Python
    boundary to one row per clip, and lets the verify step read each
    clip's frames as one map lookup instead of a per-frame join
    fan-out. Frame indices are unique per clip by construction (the
    sampling rule builds a set)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        h60_cache: dict = {}  # per-task word-hash memo (§4.5)
        for pdf in batches:
            ids: list[int] = []
            fss: list[np.ndarray] = []
            hss: list[np.ndarray] = []
            for mid, t in zip(pdf[id_col], pdf[text_col]):
                fs, hs = _avi_clip_hash_walk(t, h60_cache, every_ms)
                ids.append(mid)
                fss.append(np.array(fs, dtype=np.int32))
                hss.append(np.array(hs, dtype=np.int64))
            yield pd.DataFrame({"media_id": ids, "fs": fss, "hs": hss})

    return df.select(id_col, text_col).mapInPandas(
        run, schema="media_id long, fs array<int>, hs array<bigint>"
    )


def synth_wav_audio_fp(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(media_id, afp): synth_wav_payloads ∘ audio_fingerprints in one
    Arrow stage — real RIFF/PCM16 encode then the chunk-walk decode
    and energy-delta fingerprint."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for t in pdf[text_col]:
                payload = codecs.encode_wav(_text_samples(t))
                _, x = codecs.decode_wav(payload)
                fps.append(audio_fp_bits(x.astype(np.int64)))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "afp": fps}
            ).astype({"afp": "Int64"})

    return df.select(id_col, text_col).mapInPandas(
        run, schema="media_id long, afp long"
    )


def synth_png_image_meta(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """IMAGE_META rows: synth_png_payloads ∘ extract_image_meta in one
    Arrow stage — real PNG encode of the solid-fill image, then the
    header walk + full pixel decode for avg_pixel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "media_id", "format", "width", "height",
                "bit_depth", "channels", "avg_pixel",
            )}
            for mid, t in zip(pdf[id_col], pdf[text_col]):
                t = t if isinstance(t, str) else ""
                w = len(t) % 64 + 1
                h = (len(t) * 7) % 64 + 1
                v = (len(t) * 13) % 256
                payload = codecs.encode_png(
                    np.full((h, w), v, dtype=np.uint8)
                )
                hdr = codecs.sniff_image(payload)
                rows["media_id"].append(mid)
                rows["format"].append(hdr["format"])
                rows["width"].append(hdr["width"])
                rows["height"].append(hdr["height"])
                rows["bit_depth"].append(hdr["bit_depth"])
                rows["channels"].append(hdr["channels"])
                rows["avg_pixel"].append(
                    float(np.mean(codecs.decode_png(payload)))
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, text_col).mapInPandas(
        run, schema=IMAGE_META_SCHEMA
    )
