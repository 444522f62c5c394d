"""Pure-numpy media codecs: 24-bpp BMP and 16-bit PCM WAV.

The multimodal surface needs a REAL decode step (not a digest fake) that runs
in this sandbox, so two classic uncompressed formats are implemented from
their public byte layouts:

- BMP: 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, bottom-up rows,
  BGR pixel order, rows padded to 4-byte boundaries;
- WAV: RIFF header + fmt chunk (PCM, mono, 16-bit LE) + data chunk.

``encode_*`` produce deterministic payloads for the synthetic pipeline;
``decode_*`` parse the headers and pixel/sample data with numpy (no codec
libraries). Encode→decode round-trips are unit-tested including the row
padding and negative-sample cases; the Spark operator decodes real bytes and
its DuckDB oracle recomputes the features in closed form from the generation
parameters, making the decode exactly checkable.

Swap these for PIL/librosa/av adapters on a cluster with real media; the
operator contract (bytes in, typed features out) is unchanged.
"""

from __future__ import annotations

import struct

import numpy as np


# ----------------------------------------------------------------- BMP


def encode_bmp(pixels: np.ndarray) -> bytes:
    """pixels: (h, w, 3) uint8 RGB, row 0 = top. Returns 24-bpp BMP bytes."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    data_size = (row_bytes + pad) * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up row order
        row = pixels[y][:, ::-1]  # RGB -> BGR
        body += row.tobytes() + b"\x00" * pad
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> dict:
    """Parse a 24-bpp uncompressed BMP -> {width, height, sum_r/g/b}.

    Integer channel sums (not float means) so the oracle comparison is
    exact. Raises ValueError on anything that is not plain BI_RGB 24-bpp.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("unsupported BMP variant (need BI_RGB 24-bpp)")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    bgr = rows.astype(np.int64)
    return {
        "width": int(w),
        "height": int(h),
        "sum_r": int(bgr[:, :, 2].sum()),
        "sum_g": int(bgr[:, :, 1].sum()),
        "sum_b": int(bgr[:, :, 0].sum()),
    }


# ----------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 1000) -> bytes:
    """samples: (n,) int16 mono. Returns RIFF/WAVE PCM bytes."""
    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(payload: bytes) -> dict:
    """Parse PCM mono 16-bit WAV -> {n_samples, sample_rate, duration_ms,
    sum_abs, max_abs}. Walks RIFF chunks; integer stats for exact oracles."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (need PCM mono 16-bit)")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    a = np.abs(samples.astype(np.int64))
    n = len(samples)
    return {
        "n_samples": n,
        "sample_rate": int(sample_rate),
        "duration_ms": n * 1000 // int(sample_rate),
        "sum_abs": int(a.sum()),
        "max_abs": int(a.max()) if n else 0,
        "samples": samples,
    }


# ------------------------------------------------- deterministic generators
# Closed-form payload content from an integer id — the DuckDB oracle
# recomputes these same formulas directly, which is what upgrades the decode
# path from rows-only to an exact twin check.


def synth_bmp_pixels(doc_id: int) -> np.ndarray:
    w = 4 + doc_id % 13
    h = 3 + doc_id % 7
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    r = (x * 7 + y * 13 + doc_id) % 256
    g = (x * 11 + y * 5 + doc_id * 3) % 256
    b = (x * 3 + y * 17 + doc_id * 7) % 256
    return np.concatenate([r, g, b], axis=2).astype(np.uint8)


def synth_wav_samples(doc_id: int) -> np.ndarray:
    n = 64 + doc_id % 37
    i = np.arange(n)
    return (((doc_id * 31 + i * 17) % 2003) - 1001).astype(np.int16)
