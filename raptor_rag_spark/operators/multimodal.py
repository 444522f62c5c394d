"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as opaque ``BINARY`` columns next to
typed metadata, exactly like the `html BINARY` column of the input contract.
The Spark-side plumbing — schema, Arrow batch shape, mapInPandas signature,
partitioning — is real and tested; the actual media decode is stubbed behind
``decode_payload`` (the codec libraries are not in this sandbox), returning a
deterministic fake so tests are reproducible.

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
            for _, r in pdf.iterrows():
                payload = bytes(r[payload_col]) if r[payload_col] is not None else b""
                meta = decode_payload(payload)
                n_frames = max(1, len(payload) // 1024)
                rows.append(
                    {
                        "url": r[id_col],
                        "n_bytes": len(payload),
                        "digest": meta["digest"],
                        "fake_width": meta["width"],
                        "fake_height": meta["height"],
                        "n_sampled_frames": len(frame_sample_indices(n_frames, 4)),
                    }
                )
            yield pd.DataFrame(rows, columns=[c.split()[0] for c in FEATURES_SCHEMA.split(", ")])

    return cols.mapInPandas(extract, FEATURES_SCHEMA)
