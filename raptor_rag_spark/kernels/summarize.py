"""Deterministic cluster summarization (the LLM-summary stand-in).

The reference summarizes each cluster's concatenated text with an LLM
(reference: raptor/summarization_models.py:16-48, used at
raptor/cluster_tree_builder.py:62-79, summarization_length default 100 —
raptor/tree_builder.py:67-69). LLMs are unavailable and non-deterministic; the
north rule requires exact-match outputs, so the default summarizer is a
deterministic *extractive* kernel: greedily take the cluster context's
sentences in order while the token budget allows, always at least one.

``get_text`` reproduces the reference's exact context string
(raptor/utils.py:115-118): nodes joined by "\\n\\n" with intra-node newlines
collapsed to spaces, plus a trailing "\\n\\n" — byte-exactness matters (P6).
"""

from __future__ import annotations

import re

from .tokenizer import BaseTokenizer, DEFAULT_TOKENIZER

_SENT_RE = re.compile(r"[^.!?\n]+")


def get_text(texts: list[str]) -> str:
    """Context string from node texts, byte-identical to the reference's."""
    if not texts:
        return ""
    return "\n\n".join(" ".join(t.splitlines()) for t in texts) + "\n\n"


def extractive_summary(
    context: str, max_tokens: int = 100, tokenizer: BaseTokenizer | None = None
) -> str:
    """First sentences of ``context`` fitting in ``max_tokens`` (≥1 sentence)."""
    tok = tokenizer if tokenizer is not None else DEFAULT_TOKENIZER
    out: list[str] = []
    used = 0
    for m in _SENT_RE.finditer(context):
        sent = m.group().strip()
        if not sent:
            continue
        n = tok.count(sent)
        if out and used + n > max_tokens:
            break
        out.append(sent)
        used += n
        if used >= max_tokens:
            break
    return ". ".join(out)


class BaseSummarizationModel:
    """Pluggability contract mirroring raptor/summarization_models.py:10-13."""

    def summarize(self, context: str, max_tokens: int = 150) -> str:
        raise NotImplementedError


class ExtractiveSummarizationModel(BaseSummarizationModel):
    def __init__(self, tokenizer: BaseTokenizer | None = None):
        self.tokenizer = tokenizer if tokenizer is not None else DEFAULT_TOKENIZER

    def summarize(self, context: str, max_tokens: int = 150) -> str:
        return extractive_summary(context, max_tokens, self.tokenizer)
