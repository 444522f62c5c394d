"""Deterministic tokenizer with a tiktoken-compatible interface.

The reference counts tokens with tiktoken's ``cl100k_base``
(reference: raptor/utils.py:23, raptor/tree_builder.py:33-34). tiktoken is not
available in this sandbox, and per SURVEY.md §2.8/F3 every "token" semantic in
the engine (chunk packing, retrieval budgets, recluster gate) depends only on
``len(tokenizer.encode(text))``.  We therefore provide a pluggable tokenizer
protocol whose default is a BPE-ish regex tokenizer: words, numbers, and single
punctuation marks each count as one token.  ``encode`` returns ``list[int]``
(stable 63-bit token hashes) so the interface matches tiktoken's.
"""

from __future__ import annotations

import hashlib
import re
from abc import ABC, abstractmethod

# Words / numbers / single non-space-non-word chars — a deterministic,
# language-agnostic stand-in for a BPE vocabulary.
_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def stable_token_hash(token: str) -> int:
    """63-bit stable (process-independent) hash of a token string."""
    digest = hashlib.md5(token.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big") & 0x7FFFFFFFFFFFFFFF


def tokenize(text: str) -> list[str]:
    """Split text into token strings. Pure and deterministic."""
    if not text:
        return []
    return _TOKEN_RE.findall(text)


class BaseTokenizer(ABC):
    """tiktoken-compatible protocol: only ``encode`` is required."""

    @abstractmethod
    def encode(self, text: str) -> list[int]: ...

    def count(self, text: str) -> int:
        return len(self.encode(text))


class RegexTokenizer(BaseTokenizer):
    """Default deterministic tokenizer (see module docstring)."""

    name = "regex-v1"

    def encode(self, text: str) -> list[int]:
        return [stable_token_hash(t) for t in tokenize(text)]

    def count(self, text: str) -> int:
        # fast path: skip hashing when only the count is needed
        return len(tokenize(text))


DEFAULT_TOKENIZER = RegexTokenizer()


def token_count(text: str) -> int:
    return DEFAULT_TOKENIZER.count(text)
