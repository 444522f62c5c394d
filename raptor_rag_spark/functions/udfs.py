"""Vectorized Arrow UDFs wrapping the numpy kernels.

Only the kernels that genuinely cannot be column expressions live here
(chunking, hash-ngram embedding, batched PIP). Everything else — cells,
hashes, distances on fixed-dim arrays, text stats — is generated as JVM-side
expressions in sqlgen.py, keeping the hot path inside whole-stage codegen
(input_hint mandate: vectorized pandas/Arrow UDFs, no per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StringType

from ..kernels.chunker import split_text
from ..kernels.embedder import DEFAULT_DIM, embed_texts
from ..kernels.tokenizer import RegexTokenizer


def make_chunk_udf(max_tokens: int = 100, overlap: int = 0):
    """text -> ARRAY<STRING> chunk UDF (UDTF-shape; posexplode downstream).

    Reference role: BaseTextSplitter / split_text (raptor/utils.py:18-81).
    """
    tokenizer = RegexTokenizer()

    @F.pandas_udf(ArrayType(StringType()))
    def chunk_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: split_text(t or "", tokenizer, max_tokens, overlap))

    return chunk_udf


def make_embed_udf(dim: int = DEFAULT_DIM, model=None):
    """text -> ARRAY<FLOAT> embedding UDF (Arrow-batched, batch-level token
    cache inside embed_texts).

    Reference role: BaseEmbeddingModel.create_embedding
    (raptor/embedding_models.py:7-10), L2-normalized (:48). Passing a
    ``model`` (BaseEmbeddingModel) routes through its ``embed_batch`` —
    the pluggable-model path; None is the stock hash-ngram kernel.
    """

    @F.pandas_udf(ArrayType(FloatType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        batch = texts.fillna("").tolist()
        mat = embed_texts(batch, dim) if model is None else model.embed_batch(batch)
        return pd.Series(list(mat))

    return embed_udf
