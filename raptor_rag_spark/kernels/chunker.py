"""Greedy sentence→chunk packing with the reference's exact semantics.

Mirrors ``split_text`` (reference: raptor/utils.py:18-67) observable behavior,
including its quirks, because chunk boundaries feed every downstream node id:

- sentences are split on ``. ! ? \\n``; whitespace-only sentences are skipped
  but still occupy a slot in the sentence-token-count list (which the overlap
  re-sum formula indexes positionally — we reproduce that formula verbatim);
- a sentence longer than ``max_tokens`` is sub-split on ``, ; :`` and packed
  into its own chunks which are emitted immediately, *without* flushing the
  chunk under construction (so chunk order can interleave — reference quirk);
- token counts are ``len(tokenizer.encode(" " + unit))`` (leading space as in
  the reference).

The kernel is pure and per-document; the Spark layer maps it over Arrow
batches and ``posexplode``s the resulting chunk arrays (SURVEY.md §2.10).
"""

from __future__ import annotations

import re

from .tokenizer import BaseTokenizer, DEFAULT_TOKENIZER

_SENTENCE_SPLIT = re.compile("|".join(map(re.escape, [".", "!", "?", "\n"])))
_SUBSENTENCE_SPLIT = re.compile(r"[,;:]")


def _pack(units: list[str], counts: list[int], max_tokens: int, overlap: int) -> list[str]:
    """Greedy packer used for the sub-sentence path (raptor/utils.py:38-51)."""
    out: list[str] = []
    chunk: list[str] = []
    length = 0
    for unit, n in zip(units, counts):
        if length + n > max_tokens and chunk:
            out.append(" ".join(chunk))
            chunk = chunk[-overlap:] if overlap > 0 else []
            # reference's positional re-sum formula, reproduced verbatim
            length = sum(counts[max(0, len(chunk) - overlap) : len(chunk)])
        chunk.append(unit)
        length += n
    if chunk:
        out.append(" ".join(chunk))
    return out


def split_text(
    text: str,
    tokenizer: BaseTokenizer | None = None,
    max_tokens: int = 100,
    overlap: int = 0,
) -> list[str]:
    """Split ``text`` into chunks of at most ~``max_tokens`` tokens."""
    tok = tokenizer if tokenizer is not None else DEFAULT_TOKENIZER
    sentences = _SENTENCE_SPLIT.split(text)
    n_tokens = [len(tok.encode(" " + s)) for s in sentences]

    chunks: list[str] = []
    current: list[str] = []
    current_len = 0

    for sentence, n in zip(sentences, n_tokens):
        if not sentence.strip():
            continue

        if n > max_tokens:
            subs = [s.strip() for s in _SUBSENTENCE_SPLIT.split(sentence) if s.strip() != ""]
            sub_counts = [len(tok.encode(" " + s)) for s in subs]
            chunks.extend(_pack(subs, sub_counts, max_tokens, overlap))
        elif current_len + n > max_tokens:
            chunks.append(" ".join(current))
            current = current[-overlap:] if overlap > 0 else []
            current_len = sum(n_tokens[max(0, len(current) - overlap) : len(current)])
            current.append(sentence)
            current_len += n
        else:
            current.append(sentence)
            current_len += n

    if current:
        chunks.append(" ".join(current))
    return chunks


class BaseTextSplitter:
    """Pluggability contract mirroring raptor/utils.py:70-81."""

    def split_text(self, text: str, tokenizer, max_tokens: int) -> list[str]:
        raise NotImplementedError


class DefaultTextSplitter(BaseTextSplitter):
    def __init__(self, overlap: int = 0):
        self.overlap = overlap

    def split_text(self, text: str, tokenizer, max_tokens: int) -> list[str]:
        return split_text(text, tokenizer, max_tokens, overlap=self.overlap)
