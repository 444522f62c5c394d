"""Deterministic synthetic Common-Crawl-style page source.

Input-table contract (BASELINE.json input_hint): ``pages(url STRING, warc_ts
TIMESTAMP, html BINARY, text STRING, lang STRING)``. Every per-row value is a
pure function of the row id (md5-seeded), so the table is byte-identical
across runs, partitionings and cluster sizes — and ``text`` is *recomputed*
from ``html`` via ``extract_text`` (never copied), which is what makes the
"byte-identical extracted text per url" invariant a real check.

Site ids are log-uniform (Zipf-ish) so a few hot sites dominate — this is the
skew that exercises hot-cell salting downstream.

Generation is distributed: ``spark.range(n)`` + ``mapInPandas`` (Arrow
batches; numpy RNG seeded per row id).

Reference role: the corpus ingest surface (raptor/retrieval_augmentation.py:
170-175 takes one python string; our unit of ingest is one page row).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

VOCAB = (
    "spark shuffle partition broadcast join tile cell raster vector page crawl "
    "index query retrieval embed cluster layer summary token chunk web text html "
    "engine batch stream window watermark skew salt hash scan filter agg sort"
).split()
LANGS = ("en", "de", "fr", "es", "zh")
N_SITES = 1000
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html: bytes) -> str:
    """Deterministic HTML→text extraction: strip tags, collapse spaces,
    one line per block element. Byte-identical per input by construction."""
    s = html.decode("utf-8", errors="replace")
    s = re.sub(r"</(p|h1|title)>", "\n", s)
    s = _TAG_RE.sub(" ", s)
    lines = [_WS_RE.sub(" ", ln).strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def make_page(i: int) -> dict:
    """Pure per-row page generator (the kernel mapInPandas batches over)."""
    rng = np.random.default_rng(i + 7_777_777)
    u = rng.random()
    site = int(N_SITES**u)  # log-uniform → Zipf-ish hot sites
    url = f"https://site{site}.example.com/p/{i}"
    lang = LANGS[int(rng.integers(len(LANGS)))]
    n_sent = int(rng.integers(3, 12))
    sents = []
    for _ in range(n_sent):
        n_words = int(rng.integers(5, 18))
        words = rng.choice(len(VOCAB), size=n_words)
        sents.append(" ".join(VOCAB[w] for w in words) + ".")
    title = " ".join(VOCAB[w] for w in rng.choice(len(VOCAB), size=4))
    body = "".join(f"<p>{s}</p>" for s in sents)
    html = f"<html><head><title>{title}</title></head><body><h1>{title}</h1>{body}</body></html>".encode()
    ts = pd.Timestamp("2026-01-01", tz="UTC") + pd.Timedelta(seconds=int(rng.integers(0, 90 * 86400)))
    return {
        "url": url,
        "warc_ts": ts.tz_localize(None),
        "html": html,
        "text": extract_text(html),
        "lang": lang,
    }


PAGES_SCHEMA = "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"


def generate_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_page(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)
