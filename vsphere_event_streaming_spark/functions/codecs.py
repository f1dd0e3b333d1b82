"""Pure-Python media codecs (SURVEY §2.11 L5).

Real, library-free decoders for the formats whose specs are simple
enough to implement with the stdlib (zlib/struct) + numpy:

- **PNG**: full decode for 8-bit grayscale / RGB / RGBA — chunk walk,
  IHDR parse, multi-IDAT zlib inflate, and all five scanline unfilter
  types (None/Sub/Up/Average/Paeth, RFC 2083 §6). The encoder rotates
  filter types across scanlines so a decode exercises every unfilter
  path.
- **JPEG**: dimensions/channels from the SOFn marker scan (pixel
  decode — DCT/huffman — stays out of scope: `NotImplementedError`).
- **WAV**: RIFF/fmt/data chunk walk; PCM 8/16-bit sample decode.

These close the L5 "decode is stubbed" gap for the formats above; the
deterministic fake decoder in :mod:`multimodal` remains for synthetic
payloads that are not real media bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color type → samples per pixel (8-bit depth only).
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode a uint8 array as a real PNG.

    ``pixels`` is (h, w) for grayscale, (h, w, 3) RGB or (h, w, 4)
    RGBA. Scanline filters rotate 0→4 by row so decoders must
    implement every unfilter type to reconstruct the image — this is
    what makes a decode of our own output a real codec test, not an
    echo.
    """
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        h, w = pixels.shape
        color_type, channels = 0, 1
        flat = pixels.reshape(h, w)
    elif pixels.ndim == 3 and pixels.shape[2] in (3, 4):
        h, w, channels = pixels.shape
        color_type = 2 if channels == 3 else 6
        flat = pixels.reshape(h, w * channels)
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    bpp = channels  # bytes per pixel at bit depth 8
    raw = bytearray()
    prev = np.zeros(flat.shape[1], dtype=np.int64)
    for y in range(h):
        row = flat[y].astype(np.int64)
        left = np.concatenate((np.zeros(bpp, dtype=np.int64), row[:-bpp]))
        ul = np.concatenate((np.zeros(bpp, dtype=np.int64), prev[:-bpp]))
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = row - left
        elif ft == 2:  # Up
            filt = row - prev
        elif ft == 3:  # Average
            filt = row - (left + prev) // 2
        else:  # Paeth
            pa = np.abs(prev - ul)
            pb = np.abs(left - ul)
            pc = np.abs(left + prev - 2 * ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = row - pred
        raw.append(ft)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    idat = zlib.compress(bytes(raw))
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _png_chunks(payload: bytes):
    pos = len(PNG_MAGIC)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield tag, data
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IEND":
            return


def png_header(payload: bytes) -> dict:
    """Parse IHDR → width/height/bit_depth/channels (no pixel decode)."""
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    for tag, data in _png_chunks(payload):
        if tag == b"IHDR":
            w, h, depth, color_type = struct.unpack_from(">IIBB", data)
            channels = _PNG_CHANNELS.get(color_type)
            if channels is None:
                raise NotImplementedError(
                    f"PNG color type {color_type} (palette/alpha-gray) "
                    "not supported"
                )
            return {
                "format": "png",
                "width": int(w),
                "height": int(h),
                "bit_depth": int(depth),
                "channels": channels,
            }
    raise ValueError("PNG missing IHDR")


def decode_png(payload: bytes) -> np.ndarray:
    """Full PNG decode → uint8 array ((h, w) gray / (h, w, c) color).

    Inflates the concatenated IDAT stream and inverts the per-scanline
    filter (all five types). 8-bit, non-interlaced images only — the
    honest capability boundary is a raised error, never a guess.
    """
    hdr = png_header(payload)
    if hdr["bit_depth"] != 8:
        raise NotImplementedError("only 8-bit PNG decode supported")
    w, h, channels = hdr["width"], hdr["height"], hdr["channels"]
    idat = b"".join(d for t, d in _png_chunks(payload) if t == b"IDAT")
    raw = zlib.decompress(idat)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch (interlace unsupported)")

    bpp = channels
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            row = line
        elif ft == 2:  # Up
            row = (line + prev) % 256
        elif ft == 1:
            # Sub is a per-channel prefix sum in disguise:
            # recon(x) = Σ line values left of x (same channel) mod 256
            row = (
                np.cumsum(line.reshape(-1, bpp), axis=0) % 256
            ).reshape(stride)
        elif ft in (3, 4):
            # Average/Paeth depend on the reconstructed left pixel:
            # sequential within the row (rows of a 100 TB corpus decode
            # in parallel across executors; within-row is cache-local).
            # Plain-int lists: per-element numpy indexing is ~5× slower.
            ln = line.tolist()
            pv = prev.tolist()
            rw = [0] * stride
            if ft == 3:
                for x in range(stride):
                    left = rw[x - bpp] if x >= bpp else 0
                    rw[x] = (ln[x] + ((left + pv[x]) >> 1)) & 255
            else:
                for x in range(stride):
                    left = rw[x - bpp] if x >= bpp else 0
                    up = pv[x]
                    ul = pv[x - bpp] if x >= bpp else 0
                    pa = abs(up - ul)
                    pb = abs(left - ul)
                    pc = abs(left + up - 2 * ul)
                    pred = (
                        left
                        if pa <= pb and pa <= pc
                        else (up if pb <= pc else ul)
                    )
                    rw[x] = (ln[x] + pred) & 255
            row = np.asarray(rw, dtype=np.int64)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = row.astype(np.uint8)
        prev = row
    return out.reshape((h, w) if channels == 1 else (h, w, channels))


def jpeg_header(payload: bytes) -> dict:
    """JPEG dimensions/channels from the SOFn marker (spec ITU T.81).

    Scans marker *segments* only: 0xFF fill bytes between segments are
    skipped (T.81 B.1.1.2), the scan stops at SOS/EOI (what follows SOS
    is entropy-coded data, not segments), and every truncation raises
    ``ValueError`` — never a leaked ``struct.error``.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, n = 2, len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker scan desynchronized")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before the real marker
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length field
            continue
        if marker in (0xDA, 0xD9):  # SOS / EOI: no SOF was seen
            break
        if pos + 4 > n:
            raise ValueError("truncated JPEG segment header")
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        if seg_len < 2 or pos + 2 + seg_len > n:
            raise ValueError("truncated JPEG segment")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seg_len < 8:
                raise ValueError("truncated JPEG SOF segment")
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, pos + 4)
            return {
                "format": "jpeg",
                "width": int(w),
                "height": int(h),
                "bit_depth": int(_prec),
                "channels": int(ncomp),
            }
        pos += 2 + seg_len
    raise ValueError("JPEG missing SOF marker")


def sniff_image(payload: bytes) -> dict:
    """Magic-byte dispatch → header dict; ValueError on unknown bytes."""
    if payload.startswith(PNG_MAGIC):
        return png_header(payload)
    if payload[:2] == b"\xff\xd8":
        return jpeg_header(payload)
    raise ValueError("unrecognized image format")


# ----------------------------------------------------------------------
# WAV (RIFF PCM)
# ----------------------------------------------------------------------
def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 mono/stereo samples as a real RIFF/WAVE payload."""
    samples = np.asarray(samples, dtype=np.int16)
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[dict, np.ndarray]:
    """Decode a PCM WAV payload → (header dict, float64 samples).

    Supports 8-bit unsigned and 16-bit signed PCM; samples normalize
    to centered float64 ((h, n) shaped (n,) mono or (n, c)).
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", chunk)
        elif tag == b"data":
            data = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _br, _ba, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"non-PCM WAV (format {audio_fmt})")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64)
    elif bits == 8:
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels)
    hdr = {
        "format": "wav",
        "channels": int(channels),
        "sample_rate": int(rate),
        "bit_depth": int(bits),
        "n_samples": int(x.shape[0]),
    }
    return hdr, x
