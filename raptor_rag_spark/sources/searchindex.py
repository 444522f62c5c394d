"""Persisted, incrementally-maintained full-text search index.

At 100 TB the inverted index is built ONCE and maintained from crawl deltas —
re-tokenizing the whole corpus per ranking job is the thing a search stack
exists to avoid. This module persists the BM25 postings (doc_id, term, tf)
in a snapshot-versioned LakeTable (hash-bucketed by term, so query-term
probes co-locate) and keeps it fresh from CDC reads:

- every global statistic BM25 needs is ADDITIVE over postings — document
  length Σtf, document frequency per term, corpus size, total length — so an
  append-only postings delta keeps ranking EXACT: searching the
  incrementally-maintained index is value-identical to ranking over a fresh
  index of the union corpus (asserted by test + the `bm25_incremental`
  contract twin against the full-corpus DuckDB oracle);
- index commits inherit the lake table's atomicity/exactly-once semantics
  (a foreachBatch ingest can maintain the index with epoch-idempotent
  commits), and time travel gives "search as of snapshot N" for free;
- `refresh_from` closes the loop with the corpus lake table: a crawl lands
  pages → `changes_between` yields exactly the new rows → one postings
  append. No external bookkeeping of what changed.

Append-only by design: a RE-crawled url (same doc_id, new text) needs its
old postings retired first — do that as `index.table.merge`-style rewrite or
a full rebuild; the engine's corpus tables are append-only per the north
rule's crawl model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranking import bm25_index, bm25_rank
from .lakehouse import LakeTable


class SearchIndex:
    def __init__(self, root: str, n_buckets: int = 8):
        self.table = LakeTable(root)
        self.n_buckets = n_buckets

    # ---------------------------------------------------------------- build
    def build(self, docs: DataFrame) -> int:
        """Full (re)build: tokenize → postings → one overwrite commit."""
        return self.table.overwrite(
            bm25_index(docs), bucket_by="term", n_buckets=self.n_buckets
        )

    def add_documents(self, docs: DataFrame, epoch_id: int | None = None) -> int:
        """Incremental maintenance: append the delta's postings. Exact
        because every BM25 statistic is additive over postings rows."""
        return self.table.append(
            bm25_index(docs),
            bucket_by="term",
            n_buckets=self.n_buckets,
            epoch_id=epoch_id,
        )

    def refresh_from(
        self,
        corpus: LakeTable,
        from_snapshot: int,
        to_snapshot: int,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> int:
        """Fold a corpus-table CDC range into the index: the rows appended
        in (from, to] are exactly the documents not yet indexed."""
        spark = SparkSession.getActiveSession()
        delta = corpus.changes_between(spark, from_snapshot, to_snapshot).select(
            id_col, text_col
        )
        return self.add_documents(delta)

    # ---------------------------------------------------------------- query
    def postings(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """The LOGICAL postings: tombstones compacted away (sum tf per
        (doc, term), keep positive) — one map-side-combined groupBy, the
        same shape every read already pays for dl/df derivation."""
        raw = self.table.read(spark, snapshot_id)
        return (
            raw.groupBy("doc_id", "term")
            .agg(F.sum("tf").alias("tf"))
            .where(F.col("tf") > 0)
        )

    def search(
        self,
        spark: SparkSession,
        queries: DataFrame,
        top_k: int = 10,
        max_df_ratio: tuple[int, int] | None = None,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """BM25 top-k per query over the persisted index — the raw corpus is
        never touched (dl/df/N/avgdl all derive from postings)."""
        return bm25_rank(
            None,
            queries,
            top_k=top_k,
            max_df_ratio=max_df_ratio,
            postings=self.postings(spark, snapshot_id),
        )

    # ---------------------------------------------------------------- delete
    def delete_documents(self, doc_ids: DataFrame, epoch_id: int | None = None) -> int:
        """Retire documents with TOMBSTONE postings: append the retired
        docs' postings with NEGATED tf. Every BM25 statistic is additive
        over postings rows, so after the compacting read (sum tf per
        (doc, term), keep > 0) the index is value-identical to one built
        without the deleted docs — O(deleted docs) work, no rewrite of the
        live postings files. The re-crawl path is delete(url) + add(url):
        two appends, both exact. Periodic `table.compact()` folds
        tombstones physically; correctness never depends on when."""
        spark = SparkSession.getActiveSession()
        live = self.postings_raw(spark)
        victims = live.join(
            F.broadcast(doc_ids.select("doc_id").distinct()), "doc_id", "left_semi"
        )
        tomb = victims.select("doc_id", "term", (-F.col("tf")).alias("tf"))
        return self.table.append(
            tomb, bucket_by="term", n_buckets=self.n_buckets, epoch_id=epoch_id
        )

    def postings_raw(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """The physical postings INCLUDING tombstones (for maintenance)."""
        return self.table.read(spark, snapshot_id)
