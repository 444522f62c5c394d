"""Text-analysis operators over the documents table (training-data pipeline).

Each operator is JVM-side expressions generated in functions/sqlgen.py, so it
has an *exact* DuckDB oracle twin (same arithmetic, same hashes). No Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G


def token_counts(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        G.token_count_col(F.col("text")).alias("n_tokens"),
        F.size(G.words_col(F.col("text"))).alias("n_words"),
        F.length("text").alias("n_chars_text"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", "lang", G.lang_id_cols(F.col("text")).alias("lang_guess"))


def quality_scores(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.round(G.quality_score_cols(F.col("text")), 6).alias("quality"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Exact-dedup fingerprint + rolling min-hash document fingerprint."""
    sh = G.shingles_col(F.col("text"), 8)
    rolling = F.when(F.size(sh) == 0, F.lit(0)).otherwise(
        F.array_min(F.transform(sh, lambda s: G.hash63_col(s)))
    )
    return docs.select(
        "doc_id",
        G.fingerprint_col(F.col("text")).alias("fingerprint"),
        rolling.alias("rolling_fp"),
    )


def normalize_texts(docs: DataFrame, col: str = "text", prefix_len: int = 80) -> DataFrame:
    """SQuAD-style normalization of a text prefix (F7 metric surface)."""
    return docs.select(
        "doc_id",
        G.normalize_answer_col(F.substring(col, 1, prefix_len)).alias("normalized"),
    )


def lm_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob): per-doc mean log-likelihood under the
    corpus's own unigram MLE language model — the classic perplexity-style
    quality gate a training pipeline runs AFTER the cheap heuristic
    ``quality_scores`` (gibberish and boilerplate both sit far from the
    corpus distribution). avg_logprob = Σ_w tf_w·ln(c_w / total) / doclen.

    Scale shape: one postings shuffle (doc_id, term, tf), one vocab-sized
    term-count aggregate, a term-keyed join back (AQE picks broadcast when
    the vocab is small), cross-row sums in exact DECIMAL. ln is the sqlgen
    twin, so the whole statistic is hash-exact against DuckDB. Empty docs
    carry no tokens and drop out (no 0/0)."""
    words = docs.select(F.col("doc_id"), G.words_col(F.col("text")).alias("ws"))
    dl = words.select("doc_id", F.size("ws").cast("long").alias("n_tokens"))
    postings = (
        words.select("doc_id", F.explode("ws").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    counts = postings.groupBy("term").agg(F.sum("tf").alias("c"))
    total = counts.agg(F.sum("c").alias("tot"))
    p = F.col("c").cast("double") / F.col("tot").cast("double")
    contrib = F.col("tf").cast("double") * G.ln_col(F.col("p"))
    per_doc = (
        postings.join(counts, "term")
        .join(F.broadcast(total))
        .withColumn("p", p)
        .withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(F.sum(F.col("contrib").cast("decimal(28,15)")).cast("double").alias("s"))
    )
    return per_doc.join(dl, "doc_id").select(
        "doc_id",
        "n_tokens",
        (F.col("s") / F.col("n_tokens").cast("double")).alias("avg_logprob"),
    )


def lm_scores_sql(docs_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """DuckDB twin of :func:`lm_scores`."""
    ws = G.words_sql("text")
    return f"""
WITH words AS (SELECT doc_id, {ws} AS ws FROM ({docs_sql})),
dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM words),
postings AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(ws) AS term FROM words) GROUP BY doc_id, term),
counts AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM postings GROUP BY term),
total AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM counts),
m AS MATERIALIZED (
  SELECT doc_id, CAST(tf AS DOUBLE) AS tfd, (CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)) AS p
  FROM postings JOIN counts USING (term) CROSS JOIN total),
agg AS (
  SELECT doc_id,
         CAST(sum(CAST(tfd * {G.ln_sql('p')} AS DECIMAL(28,15))) AS DOUBLE) AS s
  FROM m GROUP BY doc_id)
SELECT doc_id, n_tokens, (s / CAST(n_tokens AS DOUBLE)) AS avg_logprob
FROM agg JOIN dl USING (doc_id)
"""


def collocations(
    docs: DataFrame,
    top_k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """(term_a, term_b, n_ab, pmi, rank): top-k bigram collocations by PMI.

    pmi = ln((n_ab · n_tok) / (n_a · n_b)) over adjacent word pairs — the
    corpus-statistics pass that surfaces multi-word expressions ("new york")
    for tokenizer/phrase-table construction. Bigrams come from zipping each
    token array with its tail (no self-join); counts are one map-side-combined
    groupBy each; the ``min_count`` filter bounds the final global top-k
    window to frequent pairs only. The ratio is evaluated in a pinned
    double order and ln is the sqlgen twin → hash-exact oracle.

    At petabyte scale the product n_ab·n_tok exceeds 2^53 and rounds in
    float64; both engines round identically (twin-pinned), so exactness
    holds — the VALUE is the standard PMI up to that rounding."""
    words = docs.select(G.words_col(F.col("text")).alias("ws"))
    toks = words.select(F.explode("ws").alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("n_w"))
    n_tok = toks.agg(F.count("*").alias("n_tok"))
    pairs = words.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ws"), 1, F.greatest(F.size("ws") - 1, F.lit(0))).alias("a"),
                F.slice(F.col("ws"), 2, F.greatest(F.size("ws") - 1, F.lit(0))).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))
    big = (
        pairs.groupBy("term_a", "term_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    ua = uni.select(F.col("w").alias("term_a"), F.col("n_w").alias("n_a"))
    ub = uni.select(F.col("w").alias("term_b"), F.col("n_w").alias("n_b"))
    arg = (F.col("n_ab").cast("double") * F.col("n_tok").cast("double")) / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    scored = (
        big.join(F.broadcast(ua), "term_a")
        .join(F.broadcast(ub), "term_b")
        .join(F.broadcast(n_tok))
        .withColumn("arg", arg)
        .withColumn("pmi", G.ln_col(F.col("arg")))
    )
    from pyspark.sql import Window

    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-k +
    # driver merge); the rank window then touches top_k rows only — never a
    # single-partition sort of the whole term-pair table
    top = scored.orderBy(F.desc("pmi"), "term_a", "term_b").limit(top_k)
    w = Window.orderBy(F.desc("pmi"), "term_a", "term_b")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("term_a", "term_b", "n_ab", "pmi", "rank")
    )


def collocations_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    top_k: int = 20,
    min_count: int = 5,
) -> str:
    """DuckDB twin of :func:`collocations` (positional self-join bigrams —
    identical pair multiset to the Spark zip)."""
    ws = G.words_sql("text")
    return f"""
WITH words AS (SELECT doc_id, {ws} AS ws FROM ({docs_sql})),
t AS (SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i FROM words),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM t GROUP BY w),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM t),
big AS (
  SELECT a.w AS term_a, b.w AS term_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY a.w, b.w HAVING count(*) >= {min_count}),
m AS MATERIALIZED (
  SELECT g.term_a, g.term_b, g.n_ab,
         ((CAST(g.n_ab AS DOUBLE) * CAST(n.n_tok AS DOUBLE)) /
          (CAST(ua.n_w AS DOUBLE) * CAST(ub.n_w AS DOUBLE))) AS arg
  FROM big g
  JOIN uni ua ON g.term_a = ua.w
  JOIN uni ub ON g.term_b = ub.w
  CROSS JOIN nt n),
s AS (SELECT term_a, term_b, n_ab, {G.ln_sql('arg')} AS pmi FROM m)
SELECT term_a, term_b, n_ab, pmi, rank FROM (
  SELECT term_a, term_b, n_ab, pmi,
         row_number() OVER (ORDER BY pmi DESC, term_a, term_b) AS rank
  FROM s) WHERE rank <= {top_k}
"""


def curate_corpus(
    docs: DataFrame,
    clusters: DataFrame,
    min_quality: float = 0.48,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """End-to-end training-corpus curation — the composition a 100-TB
    pipeline actually runs: near-dup keep-list (connected-components
    canonical resolution) ∩ language filter ∩ quality gate, with token
    counts for downstream budget accounting.

    One anti-join (broadcast of the small drop set) + pure JVM expression
    filters fused into the scan — the language/quality predicates are
    Catalyst-pushable, so at scale the dropped rows never leave the
    executors. All arithmetic comes from the sqlgen twins, so the whole
    composite has an exact DuckDB oracle."""
    from .dedup import apply_dedup

    kept = apply_dedup(docs, clusters)
    out = kept.select(
        "doc_id",
        G.lang_id_cols(F.col("text")).alias("lang_guess"),
        F.round(G.quality_score_cols(F.col("text")), 6).alias("quality"),
        G.token_count_col(F.col("text")).alias("n_tokens"),
    )
    return out.filter(
        F.col("lang_guess").isin(*langs) & (F.col("quality") >= F.lit(min_quality))
    )


def bigram_lm_scores(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob, ppl): per-doc mean log-likelihood and
    perplexity under the corpus's own add-α smoothed BIGRAM model — the
    CCNet-style LM quality gate one order up from :func:`lm_scores` (a doc of
    common words in impossible order now scores badly too):

        P(b | a) = (c(a,b) + α) / (c_ctx(a) + α·V)

    where c(a,b) = corpus bigram count, c_ctx(a) = times a occurs as a left
    context, V = vocab size. avg_logprob = Σ tf_ab·ln P(b|a) / n_bigrams,
    ppl = exp(−avg_logprob). Docs with <2 tokens carry no bigrams and drop.

    Scale shape mirrors lm_scores one order up: bigrams come from zipping
    each token array with its tail (NO positional self-join on the data
    path), per-doc and corpus counts are two map-side-combined groupBys, the
    model join is bigram-keyed (AQE broadcasts a small model), cross-row
    sums in exact DECIMAL, ln/exp are the sqlgen twins — hash-exact."""
    words = docs.select(F.col("doc_id"), G.words_col(F.col("text")).alias("ws"))
    pairs = words.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ws"), 1, F.greatest(F.size("ws") - 1, F.lit(0))).alias("a"),
                F.slice(F.col("ws"), 2, F.greatest(F.size("ws") - 1, F.lit(0))).alias("b"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    doc_tf = pairs.groupBy("doc_id", "a", "b").agg(F.count("*").alias("tf"))
    big = doc_tf.groupBy("a", "b").agg(F.sum("tf").alias("c_ab"))
    ctx = big.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    vocab = words.select(F.explode("ws").alias("w")).agg(
        F.count_distinct("w").cast("long").alias("v")
    )
    lp = G.ln_col(
        (F.col("c_ab").cast("double") + F.lit(float(alpha)))
        / (F.col("c_a").cast("double") + F.lit(float(alpha)) * F.col("v").cast("double"))
    )
    per_doc = (
        doc_tf.join(big, ["a", "b"])
        .join(ctx, "a")
        .join(F.broadcast(vocab))
        .withColumn("contrib", F.col("tf").cast("double") * lp)
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(F.col("contrib").cast("decimal(28,15)")).cast("double").alias("s"),
        )
    )
    avg = F.col("s") / F.col("n_bigrams").cast("double")
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        avg.alias("avg_logprob"),
        G.exp_col(-avg).alias("ppl"),
    )


def bigram_lm_scores_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents", alpha: float = 0.5
) -> str:
    """DuckDB twin of :func:`bigram_lm_scores` (positional self-join bigrams
    — identical pair multiset to the Spark zip)."""
    ws = G.words_sql("text")
    p = (
        f"((CAST(c_ab AS DOUBLE) + {float(alpha)!r}) / "
        f"(CAST(c_a AS DOUBLE) + {float(alpha)!r} * CAST(v AS DOUBLE)))"
    )
    return f"""
WITH words AS (SELECT doc_id, {ws} AS ws FROM ({docs_sql})),
t AS (SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i FROM words),
doc_tf AS (
  SELECT a.doc_id, a.w AS a, b.w AS b, CAST(count(*) AS BIGINT) AS tf
  FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY a.doc_id, a.w, b.w),
big AS (SELECT a, b, CAST(sum(tf) AS BIGINT) AS c_ab FROM doc_tf GROUP BY a, b),
ctx AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM big GROUP BY a),
vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM t),
m AS MATERIALIZED (
  SELECT d.doc_id, CAST(d.tf AS DOUBLE) AS tfd, d.tf, {p} AS p
  FROM doc_tf d JOIN big USING (a, b) JOIN ctx USING (a) CROSS JOIN vocab),
agg AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         CAST(sum(CAST(tfd * {G.ln_sql('p')} AS DECIMAL(28,15))) AS DOUBLE) AS s
  FROM m GROUP BY doc_id)
SELECT doc_id, n_bigrams, (s / CAST(n_bigrams AS DOUBLE)) AS avg_logprob,
       {G.exp_sql('(-(s / CAST(n_bigrams AS DOUBLE)))')} AS ppl
FROM agg
"""


def readability(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_sents, n_words, n_syll, fk_grade): Flesch-Kincaid grade
    level per document — 0.39·(words/sentences) + 11.8·(syllables/words)
    − 15.59, with syllables approximated as vowel-group count (the standard
    heuristic) and sentences as [.!?]+ runs (min 1). Pure JVM regex
    counting — whole-stage codegen, no shuffle, no Python."""
    t = F.col(text_col)
    n_sents = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), 0)), F.lit(1)
    ).cast("long")
    words = G.words_col(t)
    n_words = F.greatest(F.size(words), F.lit(1)).cast("long")
    n_syll = F.greatest(
        F.aggregate(
            F.transform(
                words,
                lambda w: F.greatest(
                    F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)), F.lit(1)
                ),
            ),
            F.lit(0),
            lambda a, b: a + b,
        ),
        F.lit(1),
    ).cast("long")
    grade = (
        F.lit(0.39) * (F.col("n_words").cast("double") / F.col("n_sents").cast("double"))
        + F.lit(11.8) * (F.col("n_syll").cast("double") / F.col("n_words").cast("double"))
        - F.lit(15.59)
    )
    return docs.select(
        "doc_id",
        n_sents.alias("n_sents"),
        n_words.alias("n_words"),
        n_syll.alias("n_syll"),
    ).withColumn("fk_grade", F.round(grade, 6))


def readability_sql(docs_sql: str, text_col: str = "text") -> str:
    """DuckDB twin of :func:`readability`."""
    w = G.words_sql(text_col)
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(greatest(len(regexp_extract_all({text_col}, '[.!?]+')), 1) AS BIGINT) AS n_sents,
         CAST(greatest(len({w}), 1) AS BIGINT) AS n_words,
         CAST(greatest(list_sum(list_transform({w},
              x -> greatest(len(regexp_extract_all(x, '[aeiouy]+')), 1))), 1) AS BIGINT) AS n_syll
  FROM ({docs_sql}))
SELECT doc_id, n_sents, n_words, n_syll,
       round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
             + 11.8 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))
             - 15.59, 6) AS fk_grade
FROM base
"""


def benford_digits(pages: DataFrame, url_re: str) -> DataFrame:
    """(digit, n, p_obs, p_exp, chi2_term): Benford first-significant-digit
    audit of per-host page counts — the classic fabricated-data /
    scraper-loop detector for crawl volume distributions. p_exp(d) =
    ln(1+1/d)/ln(10) via the twin ln; one host groupBy, then 9-row digit
    metadata."""
    counts = (
        pages.select(F.regexp_extract("url", url_re, 2).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    digit = F.substring(F.col("x").cast("string"), 1, 1).cast("long")
    per = counts.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = per.agg(F.sum("n").cast("long").alias("t"))
    ln10 = 2.302585092994046  # ln(10) double literal, folded identically
    p_exp = G.ln_col(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")) / F.lit(ln10)
    j = per.crossJoin(F.broadcast(tot))
    p_obs = F.col("n").cast("double") / F.col("t").cast("double")
    staged = j.select("digit", "n", p_obs.alias("p_obs"), p_exp.alias("p_exp"), "t")
    chi2 = (
        (F.col("p_obs") - F.col("p_exp"))
        * (F.col("p_obs") - F.col("p_exp"))
        / F.col("p_exp")
        * F.col("t").cast("double")
    )
    return staged.select(
        "digit",
        "n",
        F.round("p_obs", 6).alias("p_obs"),
        F.round("p_exp", 6).alias("p_exp"),
        F.round(chi2, 6).alias("chi2_term"),
    )


def benford_digits_sql(pages_sql: str, url_re: str) -> str:
    """DuckDB twin of :func:`benford_digits`; yields (url)."""
    ln10 = 2.302585092994046
    return f"""
WITH counts AS (
  SELECT regexp_extract(url, '{url_re}', 2) AS host, count(*)::BIGINT AS x
  FROM ({pages_sql}) GROUP BY host),
per AS (
  SELECT CAST(substring(CAST(x AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         count(*)::BIGINT AS n
  FROM counts GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM per),
staged AS (
  SELECT digit, n,
         CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS p_obs,
         {G.ln_sql("(1.0 + 1.0 / CAST(digit AS DOUBLE))")} / {ln10!r} AS p_exp,
         t
  FROM per CROSS JOIN tot)
SELECT digit, n, round(p_obs, 6) AS p_obs, round(p_exp, 6) AS p_exp,
       round((p_obs - p_exp) * (p_obs - p_exp) / p_exp * CAST(t AS DOUBLE), 6) AS chi2_term
FROM staged
"""


def text_tiling(docs: DataFrame, block: int = 20, text_col: str = "text") -> DataFrame:
    """TextTiling-style topic segmentation (Hearst 1997, lexical-cohesion
    form): tokens group into fixed ``block``-token blocks; cohesion between
    consecutive blocks = Jaccard of their distinct-token sets; a block
    boundary is flagged where cohesion drops below the doc's mean − 0.5·sd
    (the valley rule). Output one row per adjacent block pair:
    (doc_id, block_id, cohesion, is_boundary) — the segmentation signal a
    RAPTOR-style chunker upgrades to when sentence windows are too uniform.
    Per-doc windows only — never a global sort.

    Scale shape: one posexplode; block sets via (doc, block) groupBy;
    cohesion via a doc-partitioned lead; the mean/sd normalization is a
    per-doc broadcast-back aggregate. DECIMAL moments, deterministic ties.
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.posexplode(G.words_col(F.col(text_col))).alias("pos", "w")
    ).withColumn("block_id", F.floor(F.col("pos") / block).cast("long"))
    blocks = toks.groupBy("doc_id", "block_id").agg(
        F.array_sort(F.collect_set("w")).alias("ts")
    )
    wlead = Window.partitionBy("doc_id").orderBy("block_id")
    pairs = blocks.withColumn("ts2", F.lead("ts").over(wlead)).where(
        F.col("ts2").isNotNull()
    )
    inter = F.size(F.array_intersect("ts", "ts2"))
    uni = F.size(F.array_union("ts", "ts2"))
    coh = pairs.select(
        "doc_id",
        "block_id",
        (inter.cast("double") / uni.cast("double")).alias("cohesion"),
    )
    DEC = "decimal(28,15)"
    stats = coh.groupBy("doc_id").agg(
        (F.sum(F.col("cohesion").cast(DEC)).cast("double") / F.count(F.lit(1)).cast("double")).alias("mu"),
        (
            F.sum((F.col("cohesion") * F.col("cohesion")).cast(DEC)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("m2"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    j = coh.join(F.broadcast(stats), "doc_id")
    sd = F.sqrt(F.greatest(F.col("m2") - F.col("mu") * F.col("mu"), F.lit(0.0)))
    return j.select(
        "doc_id",
        "block_id",
        F.round("cohesion", 6).alias("cohesion"),
        # − 1e-9: mathematical ties (uniform-cohesion docs ⇒ threshold ==
        # cohesion) must resolve False on BOTH engines; sub-ulp DECIMAL-cast
        # differences cannot flip a 1e-9 margin
        (F.col("cohesion") < F.col("mu") - F.lit(0.5) * sd - F.lit(1e-9)).alias("is_boundary"),
    )


def text_tiling_sql(docs_sql: str, block: int = 20, text_col: str = "text") -> str:
    """DuckDB twin of :func:`text_tiling`."""
    w = G.words_sql(text_col)
    return f"""
WITH toks AS (
  SELECT doc_id, u.pos, u.w,
         CAST((u.pos - 1) // {block} AS BIGINT) AS block_id
  FROM (
    SELECT doc_id,
           generate_subscripts({w}, 1) AS pos,
           unnest({w}) AS w
    FROM ({docs_sql})) u),
blocks AS (
  SELECT doc_id, block_id, list_sort(list(DISTINCT w)) AS ts
  FROM toks GROUP BY doc_id, block_id),
pairs AS (
  SELECT doc_id, block_id, ts,
         lead(ts) OVER (PARTITION BY doc_id ORDER BY block_id) AS ts2
  FROM blocks QUALIFY ts2 IS NOT NULL),
coh AS (
  SELECT doc_id, block_id,
         CAST(len(list_intersect(ts, ts2)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(ts, ts2))) AS DOUBLE) AS cohesion
  FROM pairs),
stats AS (
  SELECT doc_id,
         CAST(sum(CAST(cohesion AS DECIMAL(28,15))) AS DOUBLE) / count(*) AS mu,
         CAST(sum(CAST(cohesion * cohesion AS DECIMAL(28,15))) AS DOUBLE) / count(*) AS m2
  FROM coh GROUP BY doc_id)
SELECT c.doc_id, c.block_id, round(c.cohesion, 6) AS cohesion,
       c.cohesion < s.mu - 0.5 * sqrt(greatest(s.m2 - s.mu * s.mu, 0.0)) - 1e-9 AS is_boundary
FROM coh c JOIN stats s ON s.doc_id = c.doc_id
"""


STYLO_WORDS = (
    "the", "and", "of", "to", "a", "in", "that", "is", "was", "it",
    "for", "with", "as", "on", "be", "at", "by", "this", "have", "not",
)


def stylometry_delta(
    pages: DataFrame, url_re: str, top_hosts: int = 20
) -> DataFrame:
    """Burrows' Delta authorship distance between host writing profiles:
    per host, the relative frequency of 20 fixed function words; each
    feature z-scored across hosts; Delta(h1, h2) = mean |z1 − z2| (the
    canonical stylometry measure). Output: every pair of the
    ``top_hosts`` largest hosts with (host_a, host_b, delta) — template/
    boilerplate farms and single-author mirrors surface as near-zero
    deltas between nominally different hosts.

    Scale shape: ONE corpus pass to (host, word) counts; profiles are
    host×20 metadata; the pair fan-out is bounded at top_hosts², never
    all-hosts². DECIMAL moments for the z-scores; ties in the host pick
    break on host name."""
    from pyspark.sql import Window

    DEC = "decimal(28,15)"
    words = F.explode(G.words_col(F.col("text"))).alias("w")
    hw = (
        pages.select(F.regexp_extract("url", url_re, 2).alias("host"), words)
        .where(F.col("w").isin(*STYLO_WORDS))
        .groupBy("host", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    htot = (
        pages.select(
            F.regexp_extract("url", url_re, 2).alias("host"),
            F.size(G.words_col(F.col("text"))).cast("long").alias("nt"),
        )
        .groupBy("host")
        .agg(F.sum("nt").cast("long").alias("t"), F.count(F.lit(1)).cast("long").alias("n_pages"))
    ).localCheckpoint(eager=False)  # host metadata; pick + profile consumers
    picked = htot.orderBy(F.desc("t"), "host").limit(top_hosts).select("host", "t")
    wlist = pages.sparkSession.createDataFrame(
        [(w,) for w in STYLO_WORDS], "w string"
    )
    grid = picked.crossJoin(F.broadcast(wlist))
    freq = (
        grid.join(hw, ["host", "w"], "left")
        .select(
            "host",
            "w",
            (F.coalesce("c", F.lit(0)).cast("double") / F.col("t").cast("double")).alias("f"),
        )
    ).localCheckpoint(eager=False)  # top_hosts×20 metadata; stats + z consumers
    stats = freq.groupBy("w").agg(
        (F.sum(F.col("f").cast(DEC)).cast("double") / F.count(F.lit(1)).cast("double")).alias("mu"),
        (
            F.sum((F.col("f") * F.col("f")).cast(DEC)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("m2"),
    )
    sd = F.sqrt(F.greatest(F.col("m2") - F.col("mu") * F.col("mu"), F.lit(1e-18)))
    z = freq.join(F.broadcast(stats), "w").select(
        "host", "w", ((F.col("f") - F.col("mu")) / sd).alias("z")
    )
    a = z.select(F.col("host").alias("host_a"), "w", F.col("z").alias("za"))
    b = z.select(F.col("host").alias("host_b"), "w", F.col("z").alias("zb"))
    pairs = a.join(b, "w").where(F.col("host_a") < F.col("host_b"))
    return (
        pairs.withColumn("d", F.abs(F.col("za") - F.col("zb")))
        .groupBy("host_a", "host_b")
        .agg(
            F.round(
                F.sum(F.col("d").cast(DEC)).cast("double")
                / F.lit(float(len(STYLO_WORDS))),
                6,
            ).alias("delta")
        )
    )


def stylometry_delta_sql(pages_sql: str, url_re: str, top_hosts: int = 20) -> str:
    """DuckDB twin of :func:`stylometry_delta`; yields (url, text)."""
    DEC = "DECIMAL(28,15)"
    wvals = ", ".join(f"('{w}')" for w in STYLO_WORDS)
    wlist = ", ".join(f"'{w}'" for w in STYLO_WORDS)
    words = G.words_sql("text")
    return f"""
WITH hosts AS (
  SELECT regexp_extract(url, '{url_re}', 2) AS host, text FROM ({pages_sql})),
hw AS (
  SELECT host, w, count(*)::BIGINT AS c FROM (
    SELECT host, unnest({words}) AS w FROM hosts)
  WHERE w IN ({wlist}) GROUP BY host, w),
htot AS (
  SELECT host, CAST(sum(len({words})) AS BIGINT) AS t FROM hosts GROUP BY host),
picked AS (
  SELECT host, t FROM htot ORDER BY t DESC, host LIMIT {top_hosts}),
wl(w) AS (VALUES {wvals}),
freq AS (
  SELECT p.host, wl.w,
         CAST(COALESCE(hw.c, 0) AS DOUBLE) / CAST(p.t AS DOUBLE) AS f
  FROM picked p CROSS JOIN wl
  LEFT JOIN hw ON hw.host = p.host AND hw.w = wl.w),
stats AS (
  SELECT w,
         CAST(sum(CAST(f AS {DEC})) AS DOUBLE) / count(*) AS mu,
         CAST(sum(CAST(f * f AS {DEC})) AS DOUBLE) / count(*) AS m2
  FROM freq GROUP BY w),
z AS (
  SELECT f.host, f.w,
         (f.f - s.mu) / sqrt(greatest(s.m2 - s.mu * s.mu, 1e-18)) AS z
  FROM freq f JOIN stats s ON s.w = f.w)
SELECT a.host AS host_a, b.host AS host_b,
       round(CAST(sum(CAST(abs(a.z - b.z) AS {DEC})) AS DOUBLE)
             / {float(len(STYLO_WORDS))!r}, 6) AS delta
FROM z a JOIN z b ON a.w = b.w AND a.host < b.host
GROUP BY a.host, b.host
"""


def vocab_growth(
    docs: DataFrame, n_buckets: int = 16, text_col: str = "text"
) -> DataFrame:
    """Heaps'-law vocabulary growth: docs split into ``n_buckets``
    doc_id-ordered batches; per batch boundary b, N(b) = cumulative token
    count and V(b) = cumulative DISTINCT vocabulary — computed WITHOUT
    re-scanning prefixes: each term maps to the FIRST bucket it appears in
    (one min-groupBy over the vocabulary), so V(b) is a cumulative sum of
    first-appearance counts. A log-log OLS fit of V = K·N^beta rides along
    (closed form, twin ln). Output per bucket: (bucket, n_tokens_cum,
    vocab_cum, k_hat, beta) — beta ≈ 0.5 is healthy natural text; beta
    near 0 screams boilerplate/template corpus.

    Scale shape: one corpus tokenization; vocabulary-cardinality
    min-groupBy; bucket-metadata cumulative windows; 1-row OLS broadcast
    back."""
    from pyspark.sql import Window

    DEC = "decimal(28,15)"
    hi = docs.agg((F.max("doc_id") + 1).cast("double").alias("hi"))
    toks = (
        docs.crossJoin(F.broadcast(hi))
        .select(
            F.least(
                F.floor(F.col("doc_id").cast("double") / F.col("hi") * n_buckets)
                .cast("long"),
                F.lit(n_buckets - 1),
            ).alias("bucket"),
            F.explode(G.words_col(F.col(text_col))).alias("w"),
        )
    ).localCheckpoint(eager=False)  # token stream consumed twice
    per_bucket_toks = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("nt")
    )
    first_seen = toks.groupBy("w").agg(F.min("bucket").alias("bucket"))
    per_bucket_vocab = first_seen.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("nv")
    )
    wcum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        per_bucket_toks.join(per_bucket_vocab, "bucket", "left")
        .select("bucket", "nt", F.coalesce("nv", F.lit(0)).alias("nv"))
        .withColumn("n_tokens_cum", F.sum("nt").over(wcum).cast("long"))
        .withColumn("vocab_cum", F.sum("nv").over(wcum).cast("long"))
        .select("bucket", "n_tokens_cum", "vocab_cum")
    ).localCheckpoint(eager=False)  # bucket metadata; fit + output consumers
    ln_n = G.ln_col(F.col("n_tokens_cum").cast("double"))
    ln_v = G.ln_col(F.col("vocab_cum").cast("double"))
    pts = cum.where((F.col("n_tokens_cum") > 0) & (F.col("vocab_cum") > 0)).select(
        ln_n.alias("x"), ln_v.alias("y")
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(DEC)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
    )
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fitted = fit.select(
        beta.alias("beta"), ((F.col("sy") - beta * F.col("sx")) / F.col("n")).alias("ln_k")
    )
    out = cum.crossJoin(F.broadcast(fitted))
    return out.select(
        "bucket",
        "n_tokens_cum",
        "vocab_cum",
        F.round(G.exp_col(F.col("ln_k")), 6).alias("k_hat"),
        F.round("beta", 6).alias("beta"),
    )


def vocab_growth_sql(docs_sql: str, n_buckets: int = 16, text_col: str = "text") -> str:
    """DuckDB twin of :func:`vocab_growth`."""
    DEC = "DECIMAL(28,15)"
    w = G.words_sql(text_col)
    return f"""
WITH hi AS (SELECT CAST(max(doc_id) + 1 AS DOUBLE) AS hi FROM ({docs_sql})),
toks AS MATERIALIZED (
  SELECT least(CAST(floor(CAST(doc_id AS DOUBLE) / (SELECT hi FROM hi) * {n_buckets}) AS BIGINT),
               {n_buckets - 1}) AS bucket,
         unnest({w}) AS w
  FROM ({docs_sql})),
pbt AS (SELECT bucket, count(*)::BIGINT AS nt FROM toks GROUP BY bucket),
fs AS (SELECT w, min(bucket) AS bucket FROM toks GROUP BY w),
pbv AS (SELECT bucket, count(*)::BIGINT AS nv FROM fs GROUP BY bucket),
cum AS MATERIALIZED (
  SELECT p.bucket,
         CAST(sum(p.nt) OVER (ORDER BY p.bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_tokens_cum,
         CAST(sum(COALESCE(v.nv, 0)) OVER (ORDER BY p.bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_cum
  FROM pbt p LEFT JOIN pbv v ON v.bucket = p.bucket),
pts AS (
  SELECT {G.ln_sql("CAST(n_tokens_cum AS DOUBLE)")} AS x,
         {G.ln_sql("CAST(vocab_cum AS DOUBLE)")} AS y
  FROM cum WHERE n_tokens_cum > 0 AND vocab_cum > 0),
fit AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(x AS {DEC})) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS {DEC})) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * y AS {DEC})) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x * x AS {DEC})) AS DOUBLE) AS sxx
  FROM pts),
coef AS (
  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS ln_k
  FROM fit)
SELECT c.bucket, c.n_tokens_cum, c.vocab_cum,
       round({G.exp_sql("k.ln_k")}, 6) AS k_hat,
       round(k.beta, 6) AS beta
FROM cum c CROSS JOIN coef k
"""


def chao1_richness(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Chao1 unseen-species estimate of the TRUE vocabulary size:
    Ŝ = V + f1·(f1−1)/(2·(f2+1)) (bias-corrected form) from the observed
    vocabulary V, singleton count f1 and doubleton count f2 — "how much
    vocabulary has this crawl NOT seen yet", the coverage planning number
    that pairs with the Heaps-law growth curve. One row:
    (vocab, f1, f2, chao1, coverage) with coverage = 1 − f1/N (Good-Turing
    sample coverage, N = total tokens).

    Scale shape: one tokenization → vocabulary-cardinality counts → a
    3-number aggregate. Exact integers until the final two divisions."""
    toks = docs.select(F.explode(G.words_col(F.col(text_col))).alias("w"))
    vc = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    agg = vc.agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("f2"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    chao = (
        F.col("vocab").cast("double")
        + F.col("f1").cast("double")
        * (F.col("f1") - 1).cast("double")
        / (F.lit(2.0) * (F.col("f2") + 1).cast("double"))
    )
    cov = F.lit(1.0) - F.col("f1").cast("double") / F.col("n_tokens").cast("double")
    return agg.select(
        "vocab", "f1", "f2",
        F.round(chao, 6).alias("chao1"),
        F.round(cov, 6).alias("coverage"),
    )


def chao1_richness_sql(docs_sql: str, text_col: str = "text") -> str:
    """DuckDB twin of :func:`chao1_richness`."""
    w = G.words_sql(text_col)
    return f"""
WITH vc AS (
  SELECT w, count(*)::BIGINT AS c FROM (
    SELECT unnest({w}) AS w FROM ({docs_sql})) GROUP BY w),
agg AS (
  SELECT count(*)::BIGINT AS vocab,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
         CAST(sum(c) AS BIGINT) AS n_tokens
  FROM vc)
SELECT vocab, f1, f2,
       round(CAST(vocab AS DOUBLE)
             + CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE)
               / (2.0 * CAST(f2 + 1 AS DOUBLE)), 6) AS chao1,
       round(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS coverage
FROM agg
"""
