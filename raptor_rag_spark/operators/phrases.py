"""Positional inverted index + exact phrase search.

The IR counterpart to operators/ranking.py's BM25: BM25 answers "which docs
score best for this bag of words", phrase search answers "which docs contain
this exact word sequence" — the primitive behind quoted queries and behind
training-data decontamination sweeps (find every document containing a
benchmark sentence verbatim).

Algorithm (the classic distributed formulation): explode documents into a
positional index (doc_id, pos, term); explode each phrase into (phrase_id,
offset j, term); equi-join on term (phrase side broadcast — queries are tiny
next to the corpus); for a phrase of length L, a match exists at anchor
``pos - j`` iff all L distinct offsets appear at that anchor, which one
groupBy(phrase_id, doc_id, anchor) + countDistinct(j) == L checks. Duplicate
terms inside a phrase are handled for free (each offset must be present
independently), and anchors are implicitly ≥ 0 because offset 0 must match.

Scale notes (100 TB): the positional index is the standard build-once
artifact — persist it and pass it back in (same contract as bm25_index).
The only data-scale shuffle is the groupBy on (phrase_id, doc_id, anchor),
whose input is |postings matching any query term|; stopword-laden phrases
can be prefiltered with the same df-cap used in ranking.py. The phrase side
is always broadcast.

Reference role: none (the reference has no lexical index); this is the
webtext-side retrieval surface SURVEY.md §2.1 groups under corpus tooling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G


def positional_index(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, term): positional postings. Build once; persist at
    scale and feed it to :func:`phrase_search` via ``index=``."""
    return docs.select(
        id_col, F.posexplode(G.words_col(F.col("text"))).alias("pos", "term")
    )


def phrase_search(
    docs: DataFrame | None,
    phrases: DataFrame,
    id_col: str = "doc_id",
    index: DataFrame | None = None,
) -> DataFrame:
    """(phrase_id, doc_id, n_hits): documents containing each phrase
    verbatim, with the number of occurrences.

    docs: (doc_id, text); phrases: (phrase_id, qtext). Tokenization is the
    same twin words() used everywhere, so "shuffle partition" matches the
    token stream regardless of case/punctuation.
    """
    if index is None:
        index = positional_index(docs, id_col)
    qp = phrases.select(
        "phrase_id", F.posexplode(G.words_col(F.col("qtext"))).alias("j", "term")
    )
    plen = phrases.select(
        "phrase_id", F.size(G.words_col(F.col("qtext"))).alias("plen")
    )
    hits = index.join(F.broadcast(qp), "term").select(
        "phrase_id", id_col, (F.col("pos") - F.col("j")).alias("anchor"), "j"
    )
    anchors = (
        hits.groupBy("phrase_id", id_col, "anchor")
        .agg(F.countDistinct("j").alias("nj"))
        .join(F.broadcast(plen), "phrase_id")
        .where(F.col("nj") == F.col("plen"))
    )
    return anchors.groupBy("phrase_id", id_col).agg(F.count("*").alias("n_hits"))


def phrase_search_sql(
    docs_sql: str,
    phrases_sql: str,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`phrase_search`. ``phrases_sql`` must yield
    (phrase_id, qtext)."""
    ws = G.words_sql("text")
    qws = G.words_sql("qtext")
    return f"""
WITH idx AS (
  SELECT {id_col}, generate_subscripts(ws, 1) - 1 AS pos, unnest(ws) AS term
  FROM (SELECT {id_col}, {ws} AS ws FROM ({docs_sql}))),
qp AS (
  SELECT phrase_id, generate_subscripts(qs, 1) - 1 AS j, unnest(qs) AS term
  FROM (SELECT phrase_id, {qws} AS qs FROM ({phrases_sql}))),
plen AS (SELECT phrase_id, len({qws}) AS plen FROM ({phrases_sql})),
hits AS (
  SELECT q.phrase_id, i.{id_col}, i.pos - q.j AS anchor, q.j
  FROM idx i JOIN qp q USING (term)),
anchors AS (
  SELECT h.phrase_id, h.{id_col}, h.anchor
  FROM hits h JOIN plen p USING (phrase_id)
  GROUP BY h.phrase_id, h.{id_col}, h.anchor, p.plen
  HAVING count(DISTINCT h.j) = p.plen)
SELECT phrase_id, {id_col}, CAST(count(*) AS BIGINT) AS n_hits
FROM anchors GROUP BY phrase_id, {id_col}
"""


def gazetteer_match(
    docs: DataFrame,
    gazetteer: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Dictionary phrase tagging (gazetteer / Aho-Corasick semantics):
    every occurrence of every dictionary phrase in every document, matched
    on the normalized token stream. gazetteer: (phrase, label) with phrase
    a space-joined token sequence. Returns (doc_id, pos, phrase, label),
    pos = 1-based token position of the match start.

    Scale shape: ONE posexplode of the corpus token stream; for each
    distinct phrase length L in the dictionary (a metadata-scale driver
    collect, bounded by the longest phrase), doc L-grams come from L−1
    window leads partitioned BY DOC (never global), and match via an
    equi-join against the BROADCAST dictionary slice of that length. Work
    is O(tokens × distinct lengths) + matches — the dictionary is never
    joined un-broadcast and the corpus is never re-tokenized per phrase.
    """
    from pyspark.sql import Window

    gaz = gazetteer.select(
        "phrase", "label", F.size(F.split("phrase", " ")).alias("_len")
    ).localCheckpoint(eager=True)
    lengths = sorted(r["_len"] for r in gaz.select("_len").distinct().collect())
    toks = docs.select(
        "doc_id", F.posexplode(G.words_col(F.col(text_col))).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    w = Window.partitionBy("doc_id").orderBy("pos")
    outs = []
    for L in lengths:
        gram = F.concat_ws(
            " ", F.col("w"), *[F.lead("w", k).over(w) for k in range(1, L)]
        )
        # lead() past the doc end yields NULL → concat_ws drops it → short
        # gram that can't equal a length-L phrase, so no explicit guard
        grams = toks.select("doc_id", "pos", gram.alias("phrase"))
        outs.append(
            grams.join(
                F.broadcast(gaz.where(F.col("_len") == L).select("phrase", "label")),
                "phrase",
            ).select("doc_id", "pos", "phrase", "label")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def gazetteer_match_sql(
    docs_sql: str, entries: list[tuple[str, str]], text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`gazetteer_match` for a literal dictionary."""
    vals = ", ".join(f"('{p}', '{l}')" for p, l in entries)
    lengths = sorted({len(p.split()) for p, _ in entries})
    per_len = []
    for L in lengths:
        leads = ", ".join(
            f"lead(w, {k}) OVER (PARTITION BY doc_id ORDER BY pos)" for k in range(1, L)
        )
        gram = f"concat_ws(' ', w{', ' + leads if leads else ''})"
        per_len.append(f"""
SELECT t.doc_id, t.pos, g.phrase, g.label
FROM (SELECT doc_id, pos, {gram} AS gram FROM toks) t
JOIN gaz g ON g.phrase = t.gram AND g.len = {L}""")
    union = "\nUNION ALL".join(per_len)
    return f"""
WITH toks AS (
  SELECT doc_id, u.pos, u.w FROM (
    SELECT doc_id,
           generate_subscripts({G.words_sql(text_col)}, 1) AS pos,
           unnest({G.words_sql(text_col)}) AS w
    FROM ({docs_sql})) u),
gaz AS (
  SELECT phrase, label, len(string_split(phrase, ' ')) AS len
  FROM (VALUES {vals}) AS v(phrase, label))
{union}
"""
