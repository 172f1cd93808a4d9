"""Pure-numpy codecs for uncompressed media containers: BMP, PPM, WAV.

These are the real decode paths behind the multimodal operators
(``operators/multimodal.py``).  The container has no image/audio
libraries, but uncompressed formats need none — their public
specifications (Windows BITMAPINFOHEADER, netpbm P6, RIFF/WAVE PCM) are
simple enough to parse with ``struct`` + numpy reshapes:

* **BMP** — 24-bit ``BI_RGB`` (uncompressed): little-endian headers,
  bottom-up pixel rows (top-down when height is negative), BGR channel
  order, rows padded to 4-byte boundaries.
* **PPM** — binary netpbm ``P6``: ASCII header (whitespace-separated
  width/height/maxval, ``#`` comments allowed) followed by raw RGB bytes.
* **WAV** — RIFF/WAVE with 16-bit integer PCM samples; chunk-walked, so
  extra chunks (LIST, fact, ...) are skipped correctly.

Encoders exist so tests and oracle fixtures can plant real payloads and
verify byte-exact decode round-trips; decoders are additionally pinned to
hand-written golden byte strings in ``tests/test_codecs.py`` (so an
encoder/decoder bug pair cannot cancel out).

Scale note: codecs run per-payload inside Arrow-batched ``mapInPandas``
stages — numpy does the per-pixel work, Python only touches headers.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up rows, BGR order, 4-byte row padding)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    row_size = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    header = _BMP_HEADER.pack(b"BM", 14 + 40 + len(data), 0, 0, 54)
    info = _BMP_INFO.pack(40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP to an ``(h, w, 3)`` uint8 RGB array.
    Handles bottom-up and top-down (negative height) layouts and 4-byte
    row padding; rejects compressed or non-24-bit variants explicitly."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down, h = h_raw < 0, abs(h_raw)
    row_size = (w * 3 + 3) & ~3
    arr = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = arr.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as binary netpbm P6."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_ppm expects (h, w, 3) RGB")
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()


def _ppm_tokens(payload: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers from a netpbm
    header, skipping ``#`` comments; returns (values, offset past the
    single whitespace byte that terminates the last token)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte after maxval per spec


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary netpbm P6 to an ``(h, w, 3)`` uint8 RGB array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (w, h, maxval), offset = _ppm_tokens(payload, 3, 2)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (only 255)")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=offset)
    return arr.reshape(h, w, 3).copy()


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 PCM samples — ``(n,)`` mono or ``(n, channels)`` — as
    a RIFF/WAVE file."""
    samples = np.asarray(samples, dtype="<i2")
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.tobytes()  # C order == interleaved frames
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE 16-bit PCM payload to ``(samples, sample_rate)``
    — samples ``(n,)`` int16 for mono, ``(n, channels)`` otherwise.
    Walks chunks, so LIST/fact/etc. chunks between fmt and data are
    skipped per the RIFF spec."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        chunk = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif cid == b"data":
            data = chunk
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples.copy(), sample_rate


def decode_any_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes: ``BM`` → BMP, ``P6`` → PPM."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise ValueError("unrecognized image container (expected BMP or P6 PPM)")
