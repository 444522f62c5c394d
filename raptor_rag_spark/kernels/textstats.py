"""Text-analysis kernels for the training-data-pipeline operators.

Deduplication (exact / MinHash / SimHash / n-gram Jaccard), language-ID,
quality scoring and document fingerprinting. Everything here is defined in
terms of *portable* primitives that both Spark SQL and DuckDB SQL can compute
identically, so every operator gets an exact DuckDB oracle:

- ``portable_hash63(s)``: first 15 hex chars of md5(s) as a 60-bit int.
  Spark:  CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
  DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT
- MinHash permutation i: ``portable_hash63(i || '|' || shingle)`` (salted md5
  instead of (a*x+b) mod p — no 64-bit overflow, portable to SQL).
- SimHash: bit-majority over token hashes; ``SIMHASH_BITS`` = 16 so the
  bit-extraction sum is practical as generated SQL.

The numpy batch forms are what the Arrow UDFs call; the scalar forms document
the semantics and serve the oracle-SQL generators in functions/sqlgen.py.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

WORD_RE = re.compile(r"[a-z0-9]+")
SIMHASH_BITS = 16
MINHASH_PERMS = 16
SHINGLE_N = 3

# tiny stopword profiles for the n-gram language-ID heuristic
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ein"),
    "fr": ("le", "la", "et", "les", "un"),
    "es": ("el", "la", "de", "los", "que"),
}


def portable_hash63(s: str) -> int:
    """60-bit int from the first 15 hex chars of md5 — see module docstring."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def norm_tokens(text: str) -> list[str]:
    return WORD_RE.findall(text.lower())


def shingles(text: str, n: int = SHINGLE_N) -> list[str]:
    """Word n-gram shingles (space-joined), order-preserving, with duplicates."""
    toks = norm_tokens(text)
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


# Affine-permutation MinHash (one md5 per shingle, then cheap modular
# arithmetic per permutation — the standard a·h+b mod p scheme). Constants are
# fixed literals so Spark / DuckDB / numpy all evaluate the same integers;
# p = 2^31 − 1 keeps a·h < 2^62 (no 64-bit overflow in any engine).
MINHASH_P = 2147483647
MINHASH_A = tuple((2654435761 * (i + 1) + 40503) % MINHASH_P or 1 for i in range(MINHASH_PERMS))
MINHASH_B = tuple((40503 * (i + 1) + 2654435761) % MINHASH_P for i in range(MINHASH_PERMS))


def minhash_signature(text: str, perms: int = MINHASH_PERMS, n: int = SHINGLE_N) -> list[int]:
    sh = set(shingles(text, n))
    if not sh:
        return [0] * perms
    bases = [portable_hash63(s) % MINHASH_P for s in sh]
    return [
        min((MINHASH_A[i] * b + MINHASH_B[i]) % MINHASH_P for b in bases)
        for i in range(perms)
    ]


def simhash(text: str, bits: int = SIMHASH_BITS) -> int:
    """Bit-majority fingerprint over *distinct* token hashes."""
    toks = set(norm_tokens(text))
    if not toks:
        return 0
    votes = np.zeros(bits, dtype=np.int64)
    for t in toks:
        h = portable_hash63(t)
        for b in range(bits):
            votes[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(bits):
        if votes[b] > 0:
            out |= 1 << b
    return out


def hamming16(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFF).count("1")


def jaccard(a: str, b: str, n: int = SHINGLE_N) -> float:
    sa, sb = set(shingles(a, n)), set(shingles(b, n))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def fingerprint(text: str) -> str:
    """Exact-dedup fingerprint: md5 of lowercased, whitespace-collapsed text."""
    normalized = re.sub(r"\s+", " ", text.lower()).strip()
    return hashlib.md5(normalized.encode("utf-8")).hexdigest()


def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Rolling-hash document fingerprint: min of window-gram hashes (winnowing-lite)."""
    toks = norm_tokens(text)
    if not toks:
        return 0
    if len(toks) < window:
        return portable_hash63(" ".join(toks))
    return min(portable_hash63(" ".join(toks[i : i + window])) for i in range(len(toks) - window + 1))


def lang_scores(text: str) -> dict[str, int]:
    toks = norm_tokens(text)
    return {lang: sum(1 for t in toks if t in words) for lang, words in LANG_PROFILES.items()}


def lang_id(text: str) -> str:
    """argmax stopword-hit language; ties broken by profile order; 'und' if 0."""
    scores = lang_scores(text)
    best_lang, best = "und", 0
    for lang in LANG_PROFILES:  # fixed order = deterministic tie-break
        if scores[lang] > best:
            best_lang, best = lang, scores[lang]
    return best_lang


def quality_score(text: str) -> float:
    """Deterministic quality heuristic in [0,1]:
    0.4 * length_score + 0.3 * alpha_ratio + 0.3 * distinct_ratio, where
    length_score = min(n_tokens, 200) / 200, alpha_ratio = alnum chars / chars,
    distinct_ratio = distinct tokens / tokens. Expressible in both SQL
    dialects (see functions/sqlgen.py)."""
    toks = norm_tokens(text)
    n = len(toks)
    if n == 0 or len(text) == 0:
        return 0.0
    length_score = min(n, 200) / 200.0
    # ASCII-alnum count (not str.isalnum) so the SQL twins match exactly
    alpha = len(re.sub(r"[^A-Za-z0-9]", "", text)) / len(text)
    distinct_ratio = len(set(toks)) / n
    return 0.4 * length_score + 0.3 * alpha + 0.3 * distinct_ratio
