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
    """Pure per-row page generator (the kernel mapInPandas batches over).

    Besides body prose the page carries the crawl artifacts the curation
    operators exist to handle — all deterministic functions of the row id:

    - ``<a href>`` anchor links to other synthetic sites (link-graph source);
    - a per-site boilerplate footer line + a global nav line repeated across
      pages (CCNet paragraph-dedup targets);
    - occasional contact emails / IPv4 strings in the prose (PII-scrub
      targets);
    - tracking query params (``utm_*``/``ref``/``fbclid``) on ~40% of URLs,
      with a shared-slug path so canonicalization produces real collisions
      (URL-canonicalization/recrawl-dedup targets);
    - an occasionally repeated body paragraph (within-page repetition
      signal target).
    """
    rng = np.random.default_rng(i + 7_777_777)
    u = rng.random()
    site = int(N_SITES**u)  # log-uniform → Zipf-ish hot sites
    lang = LANGS[int(rng.integers(len(LANGS)))]
    n_sent = int(rng.integers(3, 12))
    sents = []
    for _ in range(n_sent):
        n_words = int(rng.integers(5, 18))
        words = rng.choice(len(VOCAB), size=n_words)
        sents.append(" ".join(VOCAB[w] for w in words) + ".")
    title = " ".join(VOCAB[w] for w in rng.choice(len(VOCAB), size=4))

    # crawl artifacts (drawn AFTER the base prose so the base stays stable)
    if rng.random() < 0.25 and sents:  # within-page duplicated paragraph
        sents.append(sents[int(rng.integers(len(sents)))])
    if rng.random() < 0.30:  # contact email in prose
        sents.append(
            f"contact admin{int(rng.integers(100))}@site{site}.example.com for details."
        )
    if rng.random() < 0.20:  # server IP in prose
        a, b, c, d = (int(v) for v in rng.integers(1, 255, size=4))
        sents.append(f"served from {a}.{b}.{c}.{d} edge node.")
    links = []
    for _ in range(int(rng.integers(0, 4))):  # anchor links to other sites
        tsite = int(N_SITES ** rng.random())
        tpage = int(rng.integers(0, 100_000))
        anchor = " ".join(VOCAB[w] for w in rng.choice(len(VOCAB), size=2))
        links.append(
            f'<p>see <a href="https://site{tsite}.example.com/p/{tpage}">{anchor}</a>.</p>'
        )

    if rng.random() < 0.40:  # tracked recrawl URL: shared slug + junk params
        path = f"/p/{i % 97}"
        keep = f"?page={int(rng.integers(1, 4))}" if rng.random() < 0.5 else ""
        sep = "&" if keep else "?"
        url = (
            f"https://site{site}.example.com{path}{keep}{sep}"
            f"utm_source=s{int(rng.integers(5))}&utm_campaign=c{int(rng.integers(3))}"
            f"&ref=r{int(rng.integers(7))}&fbclid={i}"
        )
    else:
        url = f"https://site{site}.example.com/p/{i}"

    body = "".join(f"<p>{s}</p>" for s in sents) + "".join(links)
    footer = (
        "<p>home about contact subscribe newsletter.</p>"
        f"<p>copyright site{site} example com all rights reserved cookie policy.</p>"
    )
    html = (
        f"<html><head><title>{title}</title></head>"
        f"<body><h1>{title}</h1>{body}{footer}</body></html>"
    ).encode()
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
