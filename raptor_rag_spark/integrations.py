"""Retriever integration adapters (J7 of SURVEY.md §2.3).

Mirrors the reference's LangChain and LlamaIndex retrievers
(integrations/langchain-raptor-rag/langchain_raptor_rag/retriever.py:55-69 and
integrations/llama-index-raptor-rag/llama_index_raptor_rag/retriever.py:44-75):
run the facade's retrieve, then materialize each selected node's text via the
result→node join (the reference's ``tree.all_nodes[node_index]`` lookup becomes
one broadcast semi-join against the nodes DataFrame).

The real framework classes are imported lazily; without langchain/llama-index
installed the adapters return plain dataclass stand-ins with the same field
names (``page_content``/``metadata`` and ``text``/``score``), so the adapter
logic — including the J7 join — is fully testable in this sandbox.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import functions as F


@dataclass
class Document:
    """LangChain ``Document`` stand-in (page_content + metadata)."""

    page_content: str
    metadata: dict = field(default_factory=dict)


@dataclass
class NodeWithScore:
    """LlamaIndex ``NodeWithScore`` stand-in (text + score + metadata)."""

    text: str
    score: float
    metadata: dict = field(default_factory=dict)


def _materialize_nodes(ra, layer_info: list[dict]) -> list[dict]:
    """The J7 result→node join: look up text for each selected node_id.

    Reference does a per-result dict lookup (retriever.py:57-59); here it is
    ONE broadcast hash join of the (tiny) selected-id set against the nodes
    table, preserving selection order."""
    ids = [info["node_index"] for info in layer_info]
    if not ids:
        return []
    rows = {
        r["node_id"]: r["text"]
        for r in ra.tree.filter(F.col("node_id").isin(ids)).select("node_id", "text").collect()
    }
    return [
        {
            "node_index": info["node_index"],
            "layer_number": info["layer_number"],
            "text": rows.get(info["node_index"], ""),
        }
        for info in layer_info
    ]


class LangChainRaptorRetriever:
    """LangChain-compatible retriever over the Spark engine.

    ``get_relevant_documents(query)`` returns ``Document`` objects (the real
    langchain class when importable, else the stand-in above) with
    ``metadata = {node_index, layer_number}`` — field-for-field the
    reference's output (langchain_raptor_rag/retriever.py:60-69)."""

    def __init__(self, ra, top_k: int = 10, max_tokens: int = 3500, collapse_tree: bool = True):
        self.ra = ra
        self.top_k = top_k
        self.max_tokens = max_tokens
        self.collapse_tree = collapse_tree

    def _document_cls(self):
        try:
            from langchain_core.documents import Document as LCDocument

            return LCDocument
        except ImportError:
            return Document

    def get_relevant_documents(self, query: str) -> list:
        _context, layer_info = self.ra.retrieve(
            query,
            top_k=self.top_k,
            max_tokens=self.max_tokens,
            collapse_tree=self.collapse_tree,
            return_layer_information=True,
        )
        doc_cls = self._document_cls()
        return [
            doc_cls(
                page_content=n["text"],
                metadata={"node_index": n["node_index"], "layer_number": n["layer_number"]},
            )
            for n in _materialize_nodes(self.ra, layer_info)
        ]


class LlamaIndexRaptorRetriever:
    """LlamaIndex-compatible retriever over the Spark engine.

    ``retrieve(query)`` returns score-ranked nodes — the reference assigns
    descending rank-based scores (llama_index_raptor_rag/retriever.py:61-75:
    score = (num_nodes - rank) / num_nodes)."""

    def __init__(self, ra, top_k: int = 10, max_tokens: int = 3500, collapse_tree: bool = True):
        self.ra = ra
        self.top_k = top_k
        self.max_tokens = max_tokens
        self.collapse_tree = collapse_tree

    def retrieve(self, query: str) -> list[NodeWithScore]:
        _context, layer_info = self.ra.retrieve(
            query,
            top_k=self.top_k,
            max_tokens=self.max_tokens,
            collapse_tree=self.collapse_tree,
            return_layer_information=True,
        )
        nodes = _materialize_nodes(self.ra, layer_info)
        num = len(nodes)
        return [
            NodeWithScore(
                text=n["text"],
                score=(num - rank) / num,
                metadata={"node_index": n["node_index"], "layer_number": n["layer_number"]},
            )
            for rank, n in enumerate(nodes)
        ]
