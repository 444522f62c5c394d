"""Deterministic sampling / splitting / sharding over the document corpus.

A training-data pipeline needs reproducible subsetting that never depends on
RNG state, partitioning, or row order — the standard trick is to hash a
stable key and threshold the hash. All three operators here are pure JVM
expressions over the sqlgen hash63 twin, so every one has a hash-exact
DuckDB oracle and produces IDENTICAL output at any parallelism:

- ``hash_split``: train/val/test assignment by hash bucket (salted, so
  different salts give independent splits).
- ``stratified_sample``: per-stratum keep fractions (e.g. per-language
  quotas) via integer-percent thresholds on the same buckets.
- ``corpus_shards``: pack documents into fixed token-budget shards in
  deterministic pseudo-random (hash) order, via a SCALABLE PREFIX SUM —
  within-bucket window cumsums in parallel plus a broadcast of the 256
  bucket offsets — instead of one global-window sort that would serialize
  onto a single task at 100 TB. Integer arithmetic end-to-end, so the
  result equals the naive global cumsum exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen as G

N_BUCKETS = 100  # percent buckets for split/sample
_PREFIX_BITS = 8  # 256-way parallelism of the sharding prefix sum


def _bucket_col(id_col: str, salt: str) -> "F.Column":
    h = G.hash63_col(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    return (h % N_BUCKETS).alias("bucket")


def _bucket_sql(id_expr: str, salt: str) -> str:
    h = G.hash63_sql(f"CAST({id_expr} AS VARCHAR) || '{':' + salt}'")
    return f"({h} % {N_BUCKETS})"


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """(id, bucket, split): deterministic train/val/test assignment.

    bucket = hash63(id ‖ salt) mod 100; split boundaries are integer
    percents. Any engine, any order, any partitioning → same assignment."""
    split = (
        F.when(F.col("bucket") < train_pct, F.lit("train"))
        .when(F.col("bucket") < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(F.col(id_col), _bucket_col(id_col, salt)).withColumn(
        "split", split
    )


def hash_split_sql(
    id_expr: str = "doc_id",
    source: str = "documents",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> str:
    b = _bucket_sql(id_expr, salt)
    return f"""
SELECT {id_expr}, bucket,
       CASE WHEN bucket < {train_pct} THEN 'train'
            WHEN bucket < {train_pct + val_pct} THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT {id_expr}, {b} AS bucket FROM {source})
"""


def stratified_sample(
    docs: DataFrame,
    strata_pcts: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_pct: int = 0,
    salt: str = "sample",
) -> DataFrame:
    """Rows whose hash bucket falls under their stratum's integer-percent
    quota — reproducible per-language (or any category) downsampling.
    Strata missing from ``strata_pcts`` keep ``default_pct``%."""
    pct = F.lit(default_pct)
    for k, v in sorted(strata_pcts.items()):
        pct = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(pct)
    return (
        docs.withColumn("bucket", _bucket_col(id_col, salt))
        .where(F.col("bucket") < pct)
        .drop("bucket")
    )


def stratified_sample_sql(
    strata_pcts: dict[str, int],
    stratum_col: str = "lang",
    id_expr: str = "doc_id",
    source: str = "documents",
    default_pct: int = 0,
    salt: str = "sample",
    select: str = "*",
) -> str:
    pct = str(default_pct)
    for k, v in sorted(strata_pcts.items()):
        pct = f"CASE WHEN {stratum_col} = '{k}' THEN {v} ELSE {pct} END"
    b = _bucket_sql(id_expr, salt)
    return f"SELECT {select} FROM {source} WHERE {b} < ({pct})"


def corpus_shards(
    docs: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    salt: str = "shard",
) -> DataFrame:
    """(id, n_tokens, h, global_cum, shard_id): fixed-token-budget sharding.

    Documents are laid out in deterministic hash order and a document whose
    START offset falls in [k·budget, (k+1)·budget) lands in shard k. The
    global cumulative sum is computed scalably: within-bucket window cumsums
    (2^_PREFIX_BITS-way parallel) + a broadcast cumsum of the tiny per-bucket
    totals. Buckets are the hash's TOP bits, so (bucket, h) order == h order
    and, with pure integers throughout, this equals the single-window global
    cumsum bit-for-bit (the DuckDB oracle computes it the naive way)."""
    base = docs.select(
        F.col(id_col),
        (
            G.token_count_col(F.col("text")).alias("n_tokens")
            if tokens_col is None
            else F.col(tokens_col).alias("n_tokens")
        ),
        G.hash63_col(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))).alias("h"),
        # bucket = TOP 8 bits of the 63-bit hash, so ordering by (pb, h) is
        # identical to ordering by h alone — the two-level prefix sum then
        # reproduces the naive global cumsum exactly
    ).withColumn("pb", F.shiftrightunsigned(F.col("h"), 63 - _PREFIX_BITS))
    w_in = (
        Window.partitionBy("pb")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    totals = base.groupBy("pb").agg(F.sum("n_tokens").alias("tot"))
    w_off = (
        Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn("off", F.sum("tot").over(w_off) - F.col("tot")).select(
        "pb", "off"
    )
    out = within.join(F.broadcast(offsets), "pb").withColumn(
        "global_cum", F.col("off") + F.col("cum_in")
    )
    return out.select(
        id_col,
        "n_tokens",
        "h",
        "global_cum",
        # integer division (div), never float: exact at any magnitude
        F.expr(f"(global_cum - n_tokens) div {token_budget}").alias("shard_id"),
    )


def corpus_shards_sql(
    token_budget: int,
    id_expr: str = "doc_id",
    source: str = "documents",
    salt: str = "shard",
) -> str:
    """Naive global-window twin of :func:`corpus_shards` (equal by integer
    exactness; DuckDB runs at oracle scale where one sort is fine)."""
    h = G.hash63_sql(f"CAST({id_expr} AS VARCHAR) || '{':' + salt}'")
    tok = G.token_count_sql("text")
    return f"""
WITH base AS (
  SELECT {id_expr}, {tok} AS n_tokens, {h} AS h,
         ({h} >> {63 - _PREFIX_BITS}) AS pb
  FROM {source}),
c AS (
  SELECT {id_expr}, n_tokens, h, pb,
         CAST(sum(n_tokens) OVER (PARTITION BY pb ORDER BY h, {id_expr}
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_in
  FROM base),
t AS (SELECT pb, CAST(sum(n_tokens) AS BIGINT) AS tot FROM base GROUP BY pb),
o AS (SELECT pb, CAST(sum(tot) OVER (ORDER BY pb
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - tot AS off
      FROM t)
SELECT {id_expr}, n_tokens, h, (o.off + c.cum_in) AS global_cum,
       CAST((o.off + c.cum_in - n_tokens) // {token_budget} AS BIGINT) AS shard_id
FROM c JOIN o USING (pb)
"""


def weighted_sample(
    df: DataFrame,
    weight_col: "F.Column | str",
    id_col: str = "doc_id",
    salt: str = "ws",
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic importance sampling: keep each row with probability
    equal to its weight ∈ [0,1] — the quality-weighted data-mixing pass of a
    training pipeline (CCNet/quality-classifier resampling), with zero RNG:
    a row survives iff hash63(id:salt) % scale < floor(weight · scale), so
    the decision is reproducible at any parallelism and re-runs keep the
    SAME documents (stable under incremental reprocessing). Pure map, no
    shuffle; hash-exact DuckDB twin via :func:`weighted_sample_sql`."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    wc = F.greatest(F.least(w, F.lit(1.0)), F.lit(0.0))
    h = G.hash63_col(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    return df.where((h % scale) < F.floor(wc * scale))


def weighted_sample_sql(
    src_sql: str,
    weight_expr: str,
    id_col: str = "doc_id",
    salt: str = "ws",
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`weighted_sample` (selects every source column)."""
    h = G.hash63_sql(f"CAST({id_col} AS VARCHAR) || '{':' + salt}'")
    w = f"greatest(least({weight_expr}, 1.0), 0.0)"
    return f"""
SELECT * FROM ({src_sql})
WHERE ({h} % {scale}) < floor({w} * {scale})
"""


def quality_rank(docs: DataFrame, buckets_bits: int = 8) -> DataFrame:
    """(doc_id, quality, rnk, pctl): the GLOBAL rank and percentile of every
    document's quality score — a distributed ECDF with NO global sort. The
    quality range [0,1] is cut into 2^bits value buckets; within-bucket
    row_numbers (bucket-partitioned windows) plus broadcast cumulative
    bucket offsets reproduce the exact global row_number over
    (quality, doc_id) — the same two-level prefix-sum trick as
    corpus_shards, applied to VALUE buckets instead of hash buckets.

    pctl = (rnk − 1)/(n − 1) (0 = worst, 1 = best), n broadcast as a 1-row
    aggregate. The percentile-normalized quality is what corpus-mixing
    recipes consume (e.g. keep the top 30% per source)."""
    from pyspark.sql import Window

    from ..functions import sqlgen as G

    nb = 1 << buckets_bits
    q = docs.select("doc_id", F.round(G.quality_score_cols(F.col("text")), 6).alias("quality"))
    base = q.withColumn(
        "vb",
        F.least(F.floor(F.col("quality") * F.lit(float(nb))).cast("long"), F.lit(nb - 1)),
    )
    w_in = Window.partitionBy("vb").orderBy("quality", "doc_id")
    within = base.withColumn("rn_in", F.row_number().over(w_in).cast("long"))
    totals = base.groupBy("vb").agg(F.count("*").alias("tot"))
    w_off = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = totals.withColumn("off", F.sum("tot").over(w_off) - F.col("tot")).select(
        "vb", "off"
    )  # 256-row metadata window
    n1 = docs.agg((F.count("*") - F.lit(1)).cast("double").alias("n1"))
    return (
        within.join(F.broadcast(offsets), "vb")
        .crossJoin(F.broadcast(n1))
        .select(
            "doc_id",
            "quality",
            (F.col("off") + F.col("rn_in")).alias("rnk"),
            (
                (F.col("off") + F.col("rn_in") - F.lit(1)).cast("double") / F.col("n1")
            ).alias("pctl"),
        )
    )


def quality_rank_sql(docs_sql: str, buckets_bits: int = 8) -> str:
    """DuckDB twin of :func:`quality_rank` — the oracle uses the PLAIN global
    row_number, proving the two-level reconstruction is exact."""
    from ..functions import sqlgen as G

    return f"""
WITH q AS (
  SELECT doc_id, round({G.quality_score_sql("text")}, 6) AS quality FROM ({docs_sql})),
n AS (SELECT CAST(count(*) - 1 AS DOUBLE) AS n1 FROM q)
SELECT doc_id, quality,
       CAST(row_number() OVER (ORDER BY quality, doc_id) AS BIGINT) AS rnk,
       (CAST(row_number() OVER (ORDER BY quality, doc_id) - 1 AS DOUBLE) / (SELECT n1 FROM n)) AS pctl
FROM q
"""


# ------------------------------------------------------------ bootstrap CI

# Cumulative Poisson(1) thresholds P(X <= k), k = 0..5; u above the last
# threshold maps to 6. Plan-time Python doubles — both engines compare the
# SAME literals, so resamples are deterministic and portable.
_POIS1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
]


def bootstrap_ci(
    docs: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    n_boot: int = 64,
) -> DataFrame:
    """ONE row (n_rows, n_boot, mean_full, lo95, med, hi95): a 95%
    bootstrap confidence interval for the corpus mean of ``value_col`` via
    the DETERMINISTIC Poissonized bootstrap — resample b assigns every row
    the weight w = Poisson(1)⁻¹(u) with u = hash(id, b)/2²⁰, the standard
    with-replacement approximation for distributed bootstrap (no RNG, no
    driver state, reproducible across engines and parallelism).

    Scale shape: one n_boot× fan-out over the corpus (pure column
    arithmetic — a ``sequence`` explode), ONE groupBy(b) with map-side
    combine for the weighted sums, then exact type-1 quantile picks over
    the n_boot metadata rows. At 100 TB this is the one-pass alternative
    to shuffling B full resamples."""
    from ..functions import sqlgen as G

    b_ex = F.explode(F.sequence(F.lit(1), F.lit(n_boot))).alias("b")
    u = (
        F.pmod(
            G.hash63_col(F.concat_ws("|", F.col(id_col).cast("string"), F.col("b").cast("string"))),
            F.lit(1 << 20),
        ).cast("double")
        / F.lit(float(1 << 20))
    )
    w = F.lit(6)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(F.col("u") < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    fan = docs.select(
        F.col(id_col), F.col(value_col).cast("double").alias("v"), b_ex
    ).withColumn("u", u).withColumn("w", w)
    per_b = fan.groupBy("b").agg(
        F.sum((F.col("w").cast("double") * F.col("v")).cast("decimal(28,15)"))
        .cast("double")
        .alias("sv"),
        F.sum("w").cast("long").alias("sw"),
    ).where(F.col("sw") > 0)
    means = per_b.select("b", (F.col("sv") / F.col("sw").cast("double")).alias("m"))
    wrk = Window.orderBy("m", "b")
    ranked = means.withColumn("_rn", F.row_number().over(wrk).cast("long"))
    nb = ranked.agg(F.count(F.lit(1)).cast("long").alias("nb"))
    picks = ranked.crossJoin(F.broadcast(nb)).select(
        F.max(F.when(F.col("_rn") == F.expr("(nb - 1) * 25 div 1000 + 1"), F.col("m"))).alias("lo95"),
        F.max(F.when(F.col("_rn") == F.expr("(nb - 1) * 500 div 1000 + 1"), F.col("m"))).alias("med"),
        F.max(F.when(F.col("_rn") == F.expr("(nb - 1) * 975 div 1000 + 1"), F.col("m"))).alias("hi95"),
    )
    full = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (
            F.sum(F.col(value_col).cast("decimal(28,15)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_full"),
    )
    return (
        full.crossJoin(F.broadcast(picks))
        .select(
            "n_rows",
            F.lit(n_boot).cast("long").alias("n_boot"),
            F.round("mean_full", 6).alias("mean_full"),
            F.round("lo95", 6).alias("lo95"),
            F.round("med", 6).alias("med"),
            F.round("hi95", 6).alias("hi95"),
        )
    )


def bootstrap_ci_sql(
    docs_sql: str, value_expr: str, id_col: str = "doc_id", n_boot: int = 64
) -> str:
    """DuckDB twin of :func:`bootstrap_ci`; ``docs_sql`` yields (id, value
    via ``value_expr`` aliased v)."""
    from ..functions import sqlgen as G

    h = G.hash63_sql(f"CAST({id_col} AS VARCHAR) || '|' || CAST(b AS VARCHAR)")
    wcase = "6"
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        wcase = f"CASE WHEN u < {_POIS1_CDF[k]!r} THEN {k} ELSE {wcase} END"
    return f"""
WITH src AS (SELECT {id_col}, CAST({value_expr} AS DOUBLE) AS v FROM ({docs_sql})),
fan AS (
  SELECT {id_col}, v, b,
         CAST(({h}) % {1 << 20} AS DOUBLE) / {float(1 << 20)!r} AS u
  FROM src, (SELECT unnest(range(1, {n_boot + 1})) AS b)),
wts AS (SELECT v, b, ({wcase}) AS w FROM fan),
per_b AS (
  SELECT b,
         CAST(sum(CAST(CAST(w AS DOUBLE) * v AS DECIMAL(28,15))) AS DOUBLE) AS sv,
         CAST(sum(w) AS BIGINT) AS sw
  FROM wts GROUP BY b HAVING sum(w) > 0),
means AS (SELECT b, sv / CAST(sw AS DOUBLE) AS m FROM per_b),
ranked AS (
  SELECT m, CAST(row_number() OVER (ORDER BY m, b) AS BIGINT) AS _rn,
         CAST(count(*) OVER () AS BIGINT) AS nb
  FROM means),
picks AS (
  SELECT max(CASE WHEN _rn = (nb - 1) * 25 // 1000 + 1 THEN m END) AS lo95,
         max(CASE WHEN _rn = (nb - 1) * 500 // 1000 + 1 THEN m END) AS med,
         max(CASE WHEN _rn = (nb - 1) * 975 // 1000 + 1 THEN m END) AS hi95
  FROM ranked),
fl AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(v AS DECIMAL(28,15))) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS mean_full
  FROM src)
SELECT n_rows, CAST({n_boot} AS BIGINT) AS n_boot,
       round(mean_full, 6) AS mean_full, round(lo95, 6) AS lo95,
       round(med, 6) AS med, round(hi95, 6) AS hi95
FROM fl, picks
"""


def sequence_pack(docs: DataFrame, seq_len: int = 2048, buckets_bits: int = 8) -> DataFrame:
    """GPT-style sequence packing: conceptually concatenate every document's
    tokens in doc_id order and split the stream into fixed ``seq_len``
    windows; emit one row per (document, training sequence) SPAN:
    (doc_id, n_tokens, seq_id, doc_off, seq_off, n) — a document straddling
    a boundary contributes one span per sequence it touches.

    The LLM-training data layout step: every token lands in exactly one
    position of exactly one training sequence, deterministically, with no
    padding between documents.

    Scale shape: global token offsets come from the two-level prefix sum
    (doc_id hash-range buckets + within-bucket cumsum + broadcast bucket
    offsets — the corpus_shards idiom), NOT a global sort; the span fan-out
    per doc is ceil(n_tokens/seq_len)+1, a bounded explode. The DuckDB twin
    uses the PLAIN global cumulative sum, proving the reconstruction exact.
    """
    from pyspark.sql import Window

    from ..functions import sqlgen as G

    nb = 1 << buckets_bits
    toks = docs.select(
        "doc_id", G.token_count_col(F.col("text")).cast("long").alias("n_tokens")
    )
    # doc_id-range buckets keep (bucket, doc_id) order == global doc_id order
    hi = toks.agg((F.max("doc_id") + 1).cast("double").alias("hi"))
    base = toks.crossJoin(F.broadcast(hi)).withColumn(
        "pb",
        F.least(
            F.floor(F.col("doc_id").cast("double") / F.col("hi") * F.lit(float(nb)))
            .cast("long"),
            F.lit(nb - 1),
        ),
    )
    w_in = (
        Window.partitionBy("pb")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    totals = base.groupBy("pb").agg(F.sum("n_tokens").alias("tot"))
    w_off = Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = totals.withColumn("off", F.sum("tot").over(w_off) - F.col("tot")).select(
        "pb", "off"
    )  # 2^bits-row metadata window
    placed = within.join(F.broadcast(offsets), "pb").select(
        "doc_id",
        "n_tokens",
        (F.col("off") + F.col("cum_in") - F.col("n_tokens")).alias("o"),
    ).where(F.col("n_tokens") > 0)
    s_lo = F.floor(F.col("o") / seq_len).cast("long")
    s_hi = F.floor((F.col("o") + F.col("n_tokens") - 1) / seq_len).cast("long")
    spans = placed.select(
        "doc_id", "n_tokens", "o", F.explode(F.sequence(s_lo, s_hi)).alias("seq_id")
    )
    seg_start = F.greatest(F.col("seq_id") * seq_len, F.col("o"))
    seg_end = F.least((F.col("seq_id") + 1) * seq_len, F.col("o") + F.col("n_tokens"))
    return spans.select(
        "doc_id",
        "n_tokens",
        "seq_id",
        (seg_start - F.col("o")).cast("long").alias("doc_off"),
        (seg_start - F.col("seq_id") * seq_len).cast("long").alias("seq_off"),
        (seg_end - seg_start).cast("long").alias("n"),
    )


def sequence_pack_sql(docs_sql: str, seq_len: int = 2048) -> str:
    """DuckDB twin of :func:`sequence_pack` — plain global cumsum oracle."""
    from ..functions import sqlgen as G

    return f"""
WITH toks AS (
  SELECT doc_id, CAST({G.token_count_sql("text")} AS BIGINT) AS n_tokens
  FROM ({docs_sql})),
placed AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS o
  FROM toks),
spans AS (
  SELECT doc_id, n_tokens, o,
         unnest(generate_series(CAST(floor(o / {seq_len}) AS BIGINT),
                                CAST(floor((o + n_tokens - 1) / {seq_len}) AS BIGINT)))
           AS seq_id
  FROM placed WHERE n_tokens > 0)
SELECT doc_id, n_tokens, seq_id,
       CAST(greatest(seq_id * {seq_len}, o) - o AS BIGINT) AS doc_off,
       CAST(greatest(seq_id * {seq_len}, o) - seq_id * {seq_len} AS BIGINT) AS seq_off,
       CAST(least((seq_id + 1) * {seq_len}, o + n_tokens)
            - greatest(seq_id * {seq_len}, o) AS BIGINT) AS n
FROM spans
"""


def mixture_sample(
    docs: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic corpus mixture resampling (the Pile/DoReMi layout
    step): downsample each source so the KEPT corpus's token mixture
    matches ``targets`` (relative weights) as closely as pure downsampling
    allows. Per source: rate = min(1, (target_s/target_ref) ·
    (tok_ref/tok_s)) where ref is the source whose target/token ratio is
    the binding constraint (no upsampling); a doc is kept iff
    hash63(salt|doc_id)/2^60 < rate — reproducible, shuffle-free selection.

    Returns the per-source audit table (source, n_docs, n_tokens,
    target_w, rate, n_kept, kept_tokens): the numbers a mixing recipe
    needs to sign off before the (separately joinable) keep-list is
    applied. One groupBy over the corpus + broadcast of the per-source
    metadata back onto the rows."""
    from ..functions import sqlgen as G

    tgt = docs.sparkSession.createDataFrame(
        [(k, float(v)) for k, v in sorted(targets.items())], "source string, target_w double"
    )
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("_id"),
        G.token_count_col(F.col("text")).cast("long").alias("nt"),
    )
    per = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
    ).join(F.broadcast(tgt), "source")
    # binding source: the one minimizing tokens/target — it keeps rate 1.0
    ratio = F.col("n_tokens").cast("double") / F.col("target_w")
    ref = per.orderBy(ratio.asc(), F.col("source")).limit(1).select(
        F.col("n_tokens").alias("ref_tokens"), F.col("target_w").alias("ref_w")
    )
    rated = per.crossJoin(F.broadcast(ref)).withColumn(
        "rate",
        F.least(
            F.lit(1.0),
            (F.col("target_w") / F.col("ref_w"))
            * (F.col("ref_tokens").cast("double") / F.col("n_tokens").cast("double")),
        ),
    )
    u = G.hash63_col(F.concat(F.lit(salt + "|"), F.col("_id").cast("string"))).cast(
        "double"
    ) / F.lit(float(1 << 60))
    kept = (
        base.join(F.broadcast(rated.select("source", "rate")), "source")
        .where(u < F.col("rate"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("nt").cast("long").alias("kept_tokens"),
        )
    )
    return (
        rated.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "target_w",
            F.round("rate", 6).alias("rate"),
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce("kept_tokens", F.lit(0).cast("long")).alias("kept_tokens"),
        )
    )


def mixture_sample_sql(
    docs_sql: str, targets: dict[str, float], salt: str = "mix"
) -> str:
    """DuckDB twin of :func:`mixture_sample`."""
    from ..functions import sqlgen as G

    vals = ", ".join(f"('{k}', {float(v)!r})" for k, v in sorted(targets.items()))
    u = G.hash63_sql(f"concat('{salt}|', CAST(_id AS VARCHAR))")
    return f"""
WITH base AS (
  SELECT source, doc_id AS _id, CAST({G.token_count_sql('text')} AS BIGINT) AS nt
  FROM ({docs_sql})),
tgt(source, target_w) AS (VALUES {vals}),
per AS (
  SELECT b.source, count(*)::BIGINT AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
         t.target_w
  FROM base b JOIN tgt t ON t.source = b.source
  GROUP BY b.source, t.target_w),
ref AS (
  SELECT n_tokens AS ref_tokens, target_w AS ref_w FROM per
  ORDER BY CAST(n_tokens AS DOUBLE) / target_w ASC, source LIMIT 1),
rated AS (
  SELECT p.*, least(1.0, (p.target_w / r.ref_w)
         * (CAST(r.ref_tokens AS DOUBLE) / CAST(p.n_tokens AS DOUBLE))) AS rate
  FROM per p CROSS JOIN ref r),
kept AS (
  SELECT b.source, count(*)::BIGINT AS n_kept, CAST(sum(b.nt) AS BIGINT) AS kept_tokens
  FROM base b JOIN rated rr ON rr.source = b.source
  WHERE CAST({u} AS DOUBLE) / {float(1 << 60)!r} < rr.rate
  GROUP BY b.source)
SELECT r.source, r.n_docs, r.n_tokens, r.target_w, round(r.rate, 6) AS rate,
       COALESCE(k.n_kept, 0)::BIGINT AS n_kept,
       COALESCE(k.kept_tokens, 0)::BIGINT AS kept_tokens
FROM rated r LEFT JOIN kept k ON k.source = r.source
"""


def negative_samples(
    docs: DataFrame, k: int = 4, id_col: str = "doc_id", salt: str = "neg"
) -> DataFrame:
    """Reproducible negative sampling for contrastive training: per anchor
    document, ``k`` pseudo-random negatives drawn by hash ring —
    candidate_j = hash63(salt|anchor|j) mod (max_id+1), remapped by an
    equi-join against the real id set (misses from sparse id spaces drop;
    a self-draw drops). Output (anchor_id, j, neg_id) — identical on every
    rerun, every engine, every partitioning, which is what makes the
    training set auditable.

    Scale shape: a k-explode of the corpus keyed by integer candidates,
    then ONE equi-join against the (id)-projected corpus — no shuffle of
    document payloads, no RNG state."""
    from ..functions import sqlgen as G

    hi = docs.agg((F.max(id_col) + 1).cast("long").alias("hi"))
    cand = (
        docs.select(F.col(id_col).alias("anchor_id"))
        .crossJoin(F.broadcast(hi))
        .select(
            "anchor_id",
            "hi",
            F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("j"),
        )
        .select(
            "anchor_id",
            "j",
            (
                G.hash63_col(
                    F.concat(
                        F.lit(salt + "|"),
                        F.col("anchor_id").cast("string"),
                        F.lit("|"),
                        F.col("j").cast("string"),
                    )
                )
                % F.col("hi")
            ).alias("cand"),
        )
    )
    ids = docs.select(F.col(id_col).alias("cand"))
    return (
        cand.join(ids, "cand")
        .where(F.col("cand") != F.col("anchor_id"))
        .select("anchor_id", "j", F.col("cand").alias("neg_id"))
    )


def negative_samples_sql(
    docs_sql: str, k: int = 4, id_col: str = "doc_id", salt: str = "neg"
) -> str:
    """DuckDB twin of :func:`negative_samples`."""
    from ..functions import sqlgen as G

    h = G.hash63_sql(
        f"concat('{salt}|', CAST(anchor_id AS VARCHAR), '|', CAST(j AS VARCHAR))"
    )
    return f"""
WITH ids AS (SELECT {id_col} AS id FROM ({docs_sql})),
hi AS (SELECT CAST(max(id) + 1 AS BIGINT) AS hi FROM ids),
cand AS (
  SELECT a.id AS anchor_id, j.j,
         {h} % (SELECT hi FROM hi) AS cand
  FROM ids a CROSS JOIN (SELECT unnest(range(0, {k})) AS j) j)
SELECT c.anchor_id, c.j, c.cand AS neg_id
FROM cand c JOIN ids i ON i.id = c.cand
WHERE c.cand <> c.anchor_id
"""
