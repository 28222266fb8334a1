"""Real, dependency-free codecs for the two self-describing UNCOMPRESSED
media container formats: BMP (BITMAPINFOHEADER, 24-bit) and WAV (RIFF,
PCM16 mono). Pure numpy + struct — no imaging/audio library required, so
these kernels run in this container for real, unlike the compressed-format
decode stubs in ``binary_ops`` (PNG/JPEG/MP4 genuinely need external
codecs and stay env-gated).

These are not toys: the encoders emit spec-conformant files (BMP's 4-byte
row padding and bottom-up BGR row order; WAV's RIFF chunk walk), and the
decoders parse the actual headers rather than assuming fixed offsets. The
registered queries prove EXACT sample recovery — payloads are synthesized
from a closed-form integer formula, round-tripped through real encode →
parquet binary column → Arrow batch → real decode, and the decoded pixel/
sample sums must hash-match a DuckDB oracle that computes the same formula
without ever touching the bytes.

Scale note: both decoders are O(payload) numpy slicing per item inside an
Arrow batch — the per-item python overhead is header parsing only; the
pixel/sample math is vectorized.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp",
    "encode_wav_pcm16",
    "decode_wav_pcm16",
]

_BMP_HEADER = "<2sIHHI"  # magic, file size, reserved x2, pixel offset
_BMP_INFO = "<IiiHHIIiiII"  # BITMAPINFOHEADER


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 rows-top-down RGB -> 24-bit uncompressed BMP bytes.

    The pixel array is stored the way the format demands: bottom-up row
    order, BGR channel order, each row padded to a 4-byte boundary (the
    classic interop trap — a 13-px row is 39 data bytes + 1 pad byte)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = rgb.shape
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    img_size = stride * h
    bgr = rgb[::-1, :, ::-1]  # bottom-up, BGR
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    header = struct.pack(_BMP_HEADER, b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack(
        _BMP_INFO, 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 rows-top-down RGB.

    Parses the real header: pixel-array offset from the file header (so
    palettes/extended headers would be skipped correctly), negative height
    = top-down row order per the spec, stride re-derived from width.
    Raises NotImplementedError for compressed or non-24bpp files — the
    honest boundary with the env-gated codec stubs."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    _hsize, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (got bpp={bpp}, "
            f"compression={comp})"
        )
    rows_bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=pixel_off
    ).reshape(h, stride)
    rgb = arr[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if rows_bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """1-D int16 samples -> mono PCM16 RIFF/WAVE bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (int16 sample array, sample rate).

    Walks the RIFF chunk list properly (chunks are length-prefixed and
    word-aligned; 'fmt ' need not immediately precede 'data'), so files
    with LIST/INFO metadata chunks decode too. Raises NotImplementedError
    for non-PCM or multi-channel audio."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    rate, n_channels, bits, audio_fmt = None, None, None, None
    data = None
    while pos + 8 <= end:
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, n_channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt / data chunk")
    if audio_fmt != 1 or n_channels != 1 or bits != 16:
        raise NotImplementedError(
            f"only mono PCM16 supported (fmt={audio_fmt}, "
            f"channels={n_channels}, bits={bits})"
        )
    return np.frombuffer(data, dtype="<i2"), rate
