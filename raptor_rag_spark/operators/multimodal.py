"""Multimodal columns: opaque binary payloads + typed metadata + REAL decode.

Image/audio/video payloads are carried as opaque ``BINARY`` columns next to
typed metadata, exactly like the `html BINARY` column of the input contract.
``decode_media_features`` performs an actual media decode — pure-numpy BMP
pixel parsing and WAV PCM sample parsing (kernels/media.py, public byte
layouts) — exact-oracle checked; ``decode_payload`` remains the generic stub
slot where PIL/librosa/av adapters plug in for compressed formats on a real
cluster.

At 100 TB the relevant properties are: payloads never pass through the driver,
feature extraction is one narrow mapInPandas (no shuffle), and metadata-only
queries prune the binary column at the parquet scan (column pruning — verify
with ``.explain``: ReadSchema must not include the payload column).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def decode_payload(payload: bytes, kind: str = "auto") -> dict:
    """STUB: media decode (image pixels / audio samples / video frames).

    Real codecs are unavailable in this environment; this returns a
    deterministic fake 'decoded' summary so the pipeline shape is testable.
    Swap in PIL/librosa/av here on a real cluster.
    """
    digest = hashlib.md5(payload).hexdigest()
    # deterministic fake dimensions derived from the digest
    w = 16 + int(digest[:2], 16)
    h = 16 + int(digest[2:4], 16)
    return {"width": w, "height": h, "digest": digest}


def frame_sample_indices(n_frames: int, k: int) -> list[int]:
    """Deterministic uniform frame sampling (video path): k indices in
    [0, n_frames) — pure arithmetic, no RNG."""
    if n_frames <= 0 or k <= 0:
        return []
    k = min(k, n_frames)
    return [(i * n_frames) // k for i in range(k)]


FEATURES_SCHEMA = (
    "url STRING, n_bytes INT, digest STRING, fake_width INT, fake_height INT, "
    "n_sampled_frames INT"
)


def binary_features(df: DataFrame, payload_col: str = "html", id_col: str = "url") -> DataFrame:
    """Feature-extract over an opaque binary column via Arrow-batched
    mapInPandas: one pass, no shuffle, payload column dropped on output."""
    cols = df.select(id_col, payload_col)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, rp in zip(pdf[id_col].to_numpy(), pdf[payload_col].to_numpy()):
                payload = bytes(rp) if rp is not None else b""
                meta = decode_payload(payload)
                n_frames = max(1, len(payload) // 1024)
                rows.append(
                    {
                        "url": rid,
                        "n_bytes": len(payload),
                        "digest": meta["digest"],
                        "fake_width": meta["width"],
                        "fake_height": meta["height"],
                        "n_sampled_frames": len(frame_sample_indices(n_frames, 4)),
                    }
                )
            yield pd.DataFrame(rows, columns=[c.split()[0] for c in FEATURES_SCHEMA.split(", ")])

    return cols.mapInPandas(extract, FEATURES_SCHEMA)


MEDIA_SCHEMA = "doc_id LONG, bmp BINARY, wav BINARY"
MEDIA_FEATURES_SCHEMA = (
    "doc_id LONG, width LONG, height LONG, sum_r LONG, sum_g LONG, sum_b LONG, "
    "n_samples LONG, duration_ms LONG, sum_abs LONG, max_abs LONG"
)


def synth_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic BMP + WAV payloads per id — stands in for a real binary
    ingest (the `html BINARY` column shape) with closed-form content the
    oracle can recompute."""
    from ..kernels.media import encode_bmp, encode_wav, synth_bmp_pixels, synth_wav_samples

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64").tolist()
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "bmp": [encode_bmp(synth_bmp_pixels(i)) for i in ids],
                    "wav": [encode_wav(synth_wav_samples(i)) for i in ids],
                }
            )

    return df.select(id_col).mapInPandas(gen, MEDIA_SCHEMA)


def decode_media_features(media: DataFrame) -> DataFrame:
    """REAL multimodal decode: parse BMP pixels and WAV samples from the
    binary columns with the pure-numpy codecs (kernels/media.py) and emit
    integer features — image dimensions + channel sums, audio duration +
    amplitude stats. One narrow mapInPandas, payloads never reach the driver,
    and every output value has an exact closed-form DuckDB twin."""
    from ..kernels.media import decode_bmp, decode_wav

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, bmp, wav in zip(
                pdf["doc_id"].to_numpy(), pdf["bmp"].to_numpy(), pdf["wav"].to_numpy()
            ):
                img = decode_bmp(bytes(bmp))
                aud = decode_wav(bytes(wav))
                rows.append(
                    {
                        "doc_id": int(did),
                        "width": img["width"],
                        "height": img["height"],
                        "sum_r": img["sum_r"],
                        "sum_g": img["sum_g"],
                        "sum_b": img["sum_b"],
                        "n_samples": aud["n_samples"],
                        "duration_ms": aud["duration_ms"],
                        "sum_abs": aud["sum_abs"],
                        "max_abs": aud["max_abs"],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[c.split()[0] for c in MEDIA_FEATURES_SCHEMA.split(", ")]
            )

    return media.mapInPandas(extract, MEDIA_FEATURES_SCHEMA)


AUDIO_FRAMES_SCHEMA = "doc_id long, frame_id long, n long, sq_sum long, zcr long"


def audio_frame_features(media: DataFrame, frame: int = 16) -> DataFrame:
    """Framewise audio analysis over REAL WAV payloads: split each decoded
    sample stream into non-overlapping ``frame``-sample windows and emit
    per-frame energy (sum of squares — integer-exact; RMS is sqrt(sq_sum/n)
    for the client) and zero-crossing count (sign products < 0). The
    short-time feature extraction every audio pipeline front-ends with,
    decoded executor-side in one narrow mapInPandas; the closed-form
    generator gives the DuckDB oracle the same integers."""
    import numpy as np

    from ..kernels.media import decode_wav

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, wav in zip(pdf["doc_id"].to_numpy(), pdf["wav"].to_numpy()):
                s = decode_wav(bytes(wav))["samples"].astype(np.int64)
                for f0 in range(0, len(s), frame):
                    seg = s[f0 : f0 + frame]
                    zc = int(np.sum(seg[:-1] * seg[1:] < 0))
                    rows.append(
                        {
                            "doc_id": int(did),
                            "frame_id": f0 // frame,
                            "n": len(seg),
                            "sq_sum": int(np.sum(seg * seg)),
                            "zcr": zc,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_id", "n", "sq_sum", "zcr"]
            )

    return media.select("doc_id", "wav").mapInPandas(extract, AUDIO_FRAMES_SCHEMA)


def audio_frame_features_sql(frame: int = 16) -> str:
    """DuckDB twin of :func:`audio_frame_features` over the synthetic
    generator's closed form (documents provides doc_id)."""
    return f"""
WITH params AS (
  SELECT doc_id, 64 + doc_id % 37 AS n FROM documents),
smp AS (
  SELECT doc_id, i, ((doc_id*31 + i*17) % 2003) - 1001 AS s
  FROM (SELECT doc_id, unnest(range(0, n)) AS i FROM params)),
nxt AS (
  SELECT doc_id, i, s,
         lead(s) OVER (PARTITION BY doc_id ORDER BY i) AS s2,
         CAST(i // {frame} AS BIGINT) AS frame_id
  FROM smp)
SELECT doc_id, frame_id, count(*)::BIGINT AS n,
       CAST(sum(s * s) AS BIGINT) AS sq_sum,
       CAST(sum(CASE WHEN s2 IS NOT NULL
                      AND CAST(i + 1 AS BIGINT) // {frame} = frame_id
                      AND s * s2 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zcr
FROM nxt GROUP BY doc_id, frame_id
"""
