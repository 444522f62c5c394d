"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All four text paths are JVM-side expressions built from the sqlgen twins
(portable md5-prefix hashing), so each has an exact DuckDB oracle. Shapes:

- exact: groupBy(fingerprint) → canonical id = min(doc_id) (hash-groupBy; one
  shuffle on the fingerprint, map-side combine for free);
- MinHash: explode shingles → per-perm salted-hash min agg → band buckets →
  self-join within bucket → Jaccard-verified pairs (shingle→minhash→band→
  bucket-join; the self-join is on tiny bucket keys, never all-pairs);
- SimHash: per-bit majority over distinct token hashes → 16-bit fingerprint;
  near-dup pairs = equal simhash (band of the fingerprint);
- embedding cosine: exact-order cosine expression over candidate pairs.

At 100 TB the bucket join is the scale path: candidate pairs are bounded by
bucket sizes, and banding parameters (PERMS×BANDS) trade recall for cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..kernels.embedder import DEFAULT_DIM
from ..kernels.textstats import MINHASH_PERMS

BANDS = 4
ROWS_PER_BAND = MINHASH_PERMS // BANDS


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(fingerprint, canonical_doc_id, n_dups) for duplicated fingerprints."""
    fp = G.fingerprint_col(F.col("text")).alias("fingerprint")
    return (
        docs.select(fp, "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_dups"))
    )


def minhash_signatures(docs: DataFrame, perms: int = MINHASH_PERMS) -> DataFrame:
    """(doc_id, h0..h{perms-1}) — affine-permutation MinHash: ONE md5 per
    shingle, then per-perm (a·h+b) mod p mins (kernels.textstats parity).
    Empty-shingle docs get 0."""
    from ..kernels.textstats import MINHASH_A, MINHASH_B, MINHASH_P

    sh = docs.select(
        "doc_id", F.explode_outer(G.shingles_col(F.col("text"))).alias("shingle")
    ).withColumn("base", G.hash63_col(F.col("shingle")) % F.lit(MINHASH_P))
    aggs = [
        F.coalesce(
            F.min((F.lit(MINHASH_A[i]) * F.col("base") + F.lit(MINHASH_B[i])) % F.lit(MINHASH_P)),
            F.lit(0),
        ).alias(f"h{i}")
        for i in range(perms)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_band_pairs(docs: DataFrame, perms: int = MINHASH_PERMS, bands: int = BANDS) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any full band of the signature."""
    sigs = minhash_signatures(docs, perms)
    rows_per_band = perms // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), *[c.alias(f"v{i}") for i, c in enumerate(cols)]))
    banded = sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc_id", F.col("bk").cast("string").alias("band_key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash_fingerprints(docs: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash) — bit-majority over distinct token hashes."""
    toks = docs.select(
        "doc_id", F.explode_outer(F.array_distinct(G.words_col(F.col("text")))).alias("tok")
    ).withColumn("h", G.hash63_col(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(F.col("tok").isNull(), F.lit(0)).otherwise(
                F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1
            )
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_doc = toks.groupBy("doc_id").agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for i in range(bits):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return per_doc.select("doc_id", sim.alias("simhash"))


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5, max_docs: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs that share ≥1
    shingle (inverted-index join — never a full cross join)."""
    d = docs.limit(max_docs) if max_docs else docs
    sh = d.select("doc_id", F.explode(F.array_distinct(G.shingles_col(F.col("text")))).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def embedding_neardup_pairs(
    vecs: DataFrame, threshold: float = 0.95, dim: int = DEFAULT_DIM, id_col: str = "vec_id"
) -> DataFrame:
    """Cosine-similarity near-dup pairs over an embedding column.

    Candidate generation: same home tile at a coarse resolution (LSH-like
    spatial bucketing from the xy projection) → exact cosine verify. The
    bucket join replaces the quadratic all-pairs at scale."""
    x, y = G.xy_cols(F.col("embedding"), dim)
    bucketed = vecs.select(id_col, "embedding", G.cell_col(x, y, 4).alias("bucket"))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    sim = G.cosine_sim_cols(F.col("a.embedding"), F.col("b.embedding"), dim)
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .withColumn("cos_sim", F.round(sim, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"), "cos_sim")
    )
