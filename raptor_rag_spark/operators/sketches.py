"""Distinct-count sketching (HyperLogLog) with a bit-exact cross-engine twin.

``approx_count_distinct`` is the standard scale answer for cardinality
(distinct URLs, distinct fingerprints) but its registers are engine-private —
unverifiable. This HLL is built from the same portable md5 hash the rest of
the engine uses, so BOTH engines compute byte-identical registers and a
byte-identical estimate: the sketch itself has an exact DuckDB oracle, while
still being a genuine O(m)-memory streaming-mergeable sketch.

Layout (Flajolet et al. 2007): p = 8 → m = 256 registers; bucket = low 8
bits of the 60-bit hash; w = the remaining 52 bits; rho(w) = leading-zero
count within 52 bits + 1 (computed exactly via length(bin(w)) — no float
log); register = max rho per bucket. Estimate = alpha·m²/Σ2^(−M_j) with the
standard small-range linear-counting correction (ln via the sqlgen twin).
2^(−M_j) terms are exact powers of two and are folded in bucket order
(ordered left fold in both engines), so even the float sum is bit-identical.

Scale shape: ONE map-side-combinable groupBy(bucket) max — 256 groups — then
a 1-row fold. Registers merge across partitions/streams by max, which is
what makes HLL the sketch of choice for distributed distinct counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G

P_BITS = 8
M_REGS = 1 << P_BITS
W_BITS = 60 - P_BITS  # hash63 is a 60-bit value (15 hex chars)
ALPHA = 0.7213 / (1.0 + 1.079 / M_REGS)  # 0.7182725932495458
ALPHA_MM = ALPHA * M_REGS * M_REGS


def hll_distinct(df: DataFrame, value_col: str) -> DataFrame:
    """One row: (est_distinct, occupied, n_exact). ``n_exact`` is the true
    distinct count (cheap at test scale) so the estimate's error is visible
    in the same result; drop it at 100 TB and keep only the sketch."""
    h = G.hash63_col(F.col(value_col))
    regs = df.select(h.alias("h")).select(
        (F.col("h") % F.lit(M_REGS)).alias("bucket"),
        F.shiftrightunsigned(F.col("h"), P_BITS).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(W_BITS + 1)).otherwise(
        F.lit(W_BITS + 1) - F.length(F.bin(F.col("w")))
    )
    per_bucket = (
        regs.withColumn("rho", rho)
        .groupBy("bucket")
        .agg(F.max("rho").alias("mj"))
        # 2^-mj is an exact power of two (integer shift, then divide)
        .withColumn("term", F.expr("1.0 / CAST(shiftleft(1L, mj) AS DOUBLE)"))
    )
    terms = F.transform(
        F.array_sort(F.collect_list(F.struct("bucket", "term"))),
        lambda s: s["term"],
    )
    folded = per_bucket.agg(
        F.count("*").alias("occ"),
        F.aggregate(terms, F.lit(0.0), lambda a, b: a + b).alias("s_occ"),
    )
    n_exact = df.agg(F.countDistinct(value_col).alias("n_exact"))
    s = (F.lit(M_REGS) - F.col("occ")).cast("double") + F.col("s_occ")
    e_raw = F.lit(ALPHA_MM) / s
    v_zero = (F.lit(M_REGS) - F.col("occ")).cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * M_REGS)) & (F.col("occ") < F.lit(M_REGS)),
        F.lit(float(M_REGS)) * G.ln_col(F.lit(float(M_REGS)) / v_zero),
    ).otherwise(e_raw)
    return folded.crossJoin(n_exact).select(
        est.alias("est_distinct"), F.col("occ").alias("occupied"), "n_exact"
    )


def hll_distinct_sql(src_sql: str, value_col: str) -> str:
    """DuckDB twin of :func:`hll_distinct`. ``src_sql`` must yield
    ``value_col``."""
    h = G.hash63_sql(value_col)
    wb1 = W_BITS + 1
    return f"""
WITH hv AS (SELECT {h} AS h, {value_col} AS v FROM ({src_sql})),
r AS (SELECT h % {M_REGS} AS bucket, h >> {P_BITS} AS w FROM hv),
rr AS (SELECT bucket,
              CASE WHEN w = 0 THEN {wb1} ELSE {wb1} - length(bin(w)) END AS rho
       FROM r),
m AS (SELECT bucket, max(rho) AS mj FROM rr GROUP BY bucket),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS occ,
         list_reduce(
           list_prepend(0.0, list(1.0 / CAST(1::BIGINT << mj AS DOUBLE) ORDER BY bucket)),
           (a, b) -> a + b) AS s_occ
  FROM m),
ne AS (SELECT CAST(count(DISTINCT {value_col}) AS BIGINT) AS n_exact FROM ({src_sql})),
est AS (
  SELECT occ,
         ({ALPHA_MM!r} / (CAST({M_REGS} - occ AS DOUBLE) + s_occ)) AS e_raw
  FROM agg)
SELECT CASE WHEN e_raw <= {2.5 * M_REGS!r} AND occ < {M_REGS}
            THEN {float(M_REGS)!r} * {G.ln_sql(f"({float(M_REGS)!r} / CAST({M_REGS} - occ AS DOUBLE))")}
            ELSE e_raw END AS est_distinct,
       occ AS occupied, n_exact
FROM est CROSS JOIN ne
"""


# ------------------------------------------------------- count-min sketch

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_table(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(d, bucket, c): the count-min table (Cormode & Muthukrishnan 2005) —
    depth salted hash rows × width counters. Like the HLL, every hash is the
    portable md5-based hash63, so both engines build byte-identical tables.
    ONE map-side-combinable groupBy over depth·width (= 2048) groups; tables
    merge across partitions/streams by +."""
    rows = df.select(F.col(value_col).alias("v")).withColumn(
        "d", F.explode(F.array(*[F.lit(d) for d in range(depth)]))
    )
    bucket = G.hash63_col(F.concat(F.col("d").cast("string"), F.lit("|"), F.col("v"))) % F.lit(width)
    return rows.select("d", bucket.alias("bucket")).groupBy("d", "bucket").agg(
        F.count("*").alias("c")
    )


def cms_estimate(
    table: DataFrame,
    items: DataFrame,
    item_col: str = "v",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(item, est): point-estimate frequencies — min over the item's depth
    counters (over-estimate only, never under). The item side broadcasts."""
    probes = items.select(F.col(item_col).alias("item")).withColumn(
        "d", F.explode(F.array(*[F.lit(d) for d in range(depth)]))
    )
    bucket = G.hash63_col(
        F.concat(F.col("d").cast("string"), F.lit("|"), F.col("item"))
    ) % F.lit(width)
    probes = probes.select("item", "d", bucket.alias("bucket"))
    # LEFT join from the probe side: the table is sparse (only buckets with
    # count > 0 materialize), so an item whose bucket is empty must see a 0
    # counter — an inner join would drop absent items entirely and take min
    # over only the non-empty rows, breaking the one-sided CMS bound
    return (
        probes.join(F.broadcast(table), ["d", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("c", F.lit(0).cast("long"))).alias("est"))
    )


def cms_heavy_terms(
    docs: DataFrame,
    top_k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(term, est, exact, rank): the top-k exact-frequency terms with their
    count-min estimates alongside — est >= exact always (one-sided error),
    and at width >= vocabulary pressure the two coincide. The composite
    exists to make the sketch's error VISIBLE in an oracle-checked result."""
    from pyspark.sql import Window

    toks = docs.select(F.explode(G.words_col(F.col("text"))).alias("v"))
    # ONE corpus scan: the vocab-sized exact counts (materialized, they are
    # metadata-scale) feed both the top-k ranking and the sketch build —
    # summing per-term counts into buckets yields a byte-identical CMS table
    # to hashing every token occurrence, without re-exploding the corpus
    exact = toks.groupBy("v").agg(F.count("*").alias("exact")).localCheckpoint(eager=True)
    w = Window.orderBy(F.desc("exact"), "v")
    top = exact.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= top_k)
    weighted = exact.withColumn(
        "d", F.explode(F.array(*[F.lit(d) for d in range(depth)]))
    )
    bucket = G.hash63_col(
        F.concat(F.col("d").cast("string"), F.lit("|"), F.col("v"))
    ) % F.lit(width)
    table = (
        weighted.select("d", bucket.alias("bucket"), "exact")
        .groupBy("d", "bucket")
        .agg(F.sum("exact").alias("c"))
    )
    est = cms_estimate(table, top.select("v"), "v", depth, width)
    return top.join(
        est.select(F.col("item").alias("v"), "est"), "v"
    ).select(F.col("v").alias("term"), "est", "exact", "rank")


def cms_heavy_terms_sql(
    docs_sql: str,
    top_k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin of :func:`cms_heavy_terms`."""
    ws = G.words_sql("text")
    h = G.hash63_sql("(CAST(d AS VARCHAR) || '|' || v)")
    return f"""
WITH toks AS (
  SELECT unnest({ws}) AS v FROM ({docs_sql})),
exact AS (SELECT v, CAST(count(*) AS BIGINT) AS exact FROM toks GROUP BY v),
top AS (
  SELECT v, exact, rank FROM (
    SELECT v, exact, row_number() OVER (ORDER BY exact DESC, v) AS rank FROM exact)
  WHERE rank <= {top_k}),
rows_ AS (SELECT v, unnest(range(0, {depth})) AS d FROM toks),
tbl AS (
  SELECT d, ({h}) % {width} AS bucket, CAST(count(*) AS BIGINT) AS c
  FROM rows_ GROUP BY 1, 2),
probes AS (SELECT v AS item, unnest(range(0, {depth})) AS d FROM top),
pb AS (SELECT item, d, ({G.hash63_sql("(CAST(d AS VARCHAR) || '|' || item)")}) % {width} AS bucket FROM probes),
est AS (
  SELECT pb.item, CAST(min(t.c) AS BIGINT) AS est
  FROM tbl t JOIN pb ON t.d = pb.d AND t.bucket = pb.bucket
  GROUP BY pb.item)
SELECT top.v AS term, est.est, top.exact, CAST(top.rank AS INT) AS rank
FROM top JOIN est ON top.v = est.item
"""
