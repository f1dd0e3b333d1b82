"""Multimodal columns (SURVEY §2.11 L5).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct (schemas.MEDIA_META). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages:
the Spark-side plumbing (schema, batch iteration, partition-parallel
execution) is real; the codec itself is stubbed because no image/audio
libraries ship in this container — ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic metadata extractor (byte-derived) so the pipeline shape
is testable end-to-end.

At 100 TB: payloads stay in parquet binary columns, scanned with
column pruning (metadata-only queries never read payload bytes);
mapInPandas batches bound memory to Arrow batch size × executor cores.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    """Decode an image payload to (width, height).

    STUB: real decoding needs an image library not present in this
    container. ``fake=True`` derives deterministic pseudo-dimensions
    from the payload bytes so the distributed plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library; not available here"
        )
    if not payload:
        return {"width": 0, "height": 0}
    return {
        "width": int(payload[0] % 64) + 1,
        "height": int(payload[min(1, len(payload) - 1)] % 64) + 1,
    }


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
    + dims. Codec stubbed (see ``decode_image``); the fake path emits a
    deterministic truncation of the bytes so batch shape, binary
    round-trip and schema are exercised for real. Arrow moves the
    payload bytes — no per-row Python pickling.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "image resize requires an imaging library; "
                    "not available here"
                )
            # fake resize: keep target_w/64ths of the payload (64 is
            # the fake codec's max width, decode_image above)
            out_payload = [
                (p[: max(1, len(p) * target_w // 64)] if p else p)
                for p in pdf["payload"]
            ]
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

    The PCM decode is stubbed: the fake path interprets the raw bytes
    as unsigned 8-bit samples (deterministic, library-free) so the
    numpy-vectorized feature math and the Arrow batch path are real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "audio decoding requires an audio library; "
                    "not available here"
                )
            n, rms, zc = [], [], []
            for p in pdf["payload"]:
                if not p:
                    n.append(0)
                    rms.append(0.0)
                    zc.append(0)
                    continue
                x = np.frombuffer(p, dtype=np.uint8).astype("float64") - 128.0
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
