"""SymSpell-style fuzzy term matching: edit-distance ≤ 1 without cross joins.

Spell-correction of query terms against a corpus vocabulary, the webtext
twin of the dedup family's candidate-generation + verify pattern: two terms
are within Damerau-free edit distance 1 iff their DELETION NEIGHBORHOODS
(the string itself plus every single-character deletion) intersect — so the
candidate pairing is a pure equi-join on deletion keys, never an all-pairs
levenshtein. Survivors are verified with the exact levenshtein (built-in in
BOTH engines, same classic definition) and carried with their corpus df.

Scale shape: the vocabulary fans out ×(len+1) (bounded by ``max_len``), one
hash groupBy builds df, the key join is an equi-join whose hot keys are
dropped by an explicit bucket cap (same guard as dedup's MAX_SHINGLE_DF —
a 100-TB vocabulary has pathological short keys), and the verify filter is
codegen. No Python, no driver loop, no quadratic path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G

MIN_LEN = 3  # terms shorter than this generate too-dense keys
MAX_LEN = 16  # bounds the per-term fan-out
MAX_KEY_BUCKET = 256  # deletion keys shared by more vocab terms are dropped


def _del_keys(df: DataFrame, term_col: str) -> DataFrame:
    """Explode each term into its deletion neighborhood (term itself at
    pos = length; char i removed at pos = i)."""
    t = F.col(term_col)
    return df.select(
        "*", F.explode(F.sequence(F.lit(0), F.length(t))).alias("pos")
    ).select(
        "*",
        F.concat(
            F.expr(f"substring({term_col}, 1, pos)"),
            F.expr(f"substring({term_col}, pos + 2, {MAX_LEN})"),
        ).alias("dkey"),
    )


def fuzzy_vocab_match(docs: DataFrame, query_terms: list[str]) -> DataFrame:
    """(qterm, term, dist, df) — every vocabulary term within edit distance 1
    of each query term, with its document frequency."""
    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(G.words_col(F.col("text"))).alias("term"), "doc_id")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.length("term").between(MIN_LEN, MAX_LEN))
    )
    vkeys = _del_keys(vocab, "term").select("term", "df", "dkey")
    key_ok = (
        vkeys.groupBy("dkey").count().where(F.col("count") <= MAX_KEY_BUCKET).select("dkey")
    )
    vkeys = vkeys.join(key_ok, "dkey")

    qdf = spark.createDataFrame([(t,) for t in query_terms], "qterm string").where(
        F.length("qterm").between(MIN_LEN, MAX_LEN)
    )
    qkeys = _del_keys(qdf, "qterm").select("qterm", "dkey")

    return (
        qkeys.join(vkeys, "dkey")
        .select("qterm", "term", "df")
        .distinct()
        .withColumn("dist", F.levenshtein("qterm", "term"))
        .where(F.col("dist") <= 1)
        .select("qterm", "term", "dist", "df")
    )


def fuzzy_vocab_match_sql(docs_sql: str, query_terms: list[str]) -> str:
    """DuckDB twin of :func:`fuzzy_vocab_match`. ``docs_sql`` must select
    (doc_id, text)."""
    qvals = ", ".join(f"('{t}')" for t in query_terms)

    def del_keys(src: str, col: str, extra: str) -> str:
        return f"""
  SELECT {col}{extra},
         concat(substring({col}, 1, pos), substring({col}, pos + 2, {MAX_LEN})) AS dkey
  FROM (SELECT *, unnest(generate_series(0, length({col}))) AS pos FROM {src})"""

    return f"""
WITH docs AS ({docs_sql}),
vocab AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM (SELECT doc_id, unnest({G.words_sql('text')}) AS term FROM docs)
  WHERE length(term) BETWEEN {MIN_LEN} AND {MAX_LEN}
  GROUP BY term),
vkeys0 AS ({del_keys('vocab', 'term', ', df')}),
key_ok AS (SELECT dkey FROM vkeys0 GROUP BY dkey HAVING count(*) <= {MAX_KEY_BUCKET}),
vkeys AS (SELECT vkeys0.* FROM vkeys0 JOIN key_ok USING (dkey)),
qterms AS (
  SELECT qterm FROM (VALUES {qvals}) q(qterm)
  WHERE length(qterm) BETWEEN {MIN_LEN} AND {MAX_LEN}),
qkeys AS ({del_keys('qterms', 'qterm', '')}),
cand AS (
  SELECT DISTINCT qterm, term, df FROM qkeys JOIN vkeys USING (dkey))
SELECT qterm, term, CAST(levenshtein(qterm, term) AS INT) AS dist, df
FROM cand WHERE levenshtein(qterm, term) <= 1
"""
