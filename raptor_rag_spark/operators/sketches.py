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
    # staged twin ln (sqlgen.append_ln — round-4 codegen-fallback fix: the
    # one-expression ln tree under the CASE blew the 64 KB/method limit)
    s = (F.lit(M_REGS) - F.col("occ")).cast("double") + F.col("s_occ")
    v_zero = (F.lit(M_REGS) - F.col("occ")).cast("double")
    staged = folded.select(
        "occ",
        (F.lit(ALPHA_MM) / s).alias("__eraw__"),
        F.when(F.col("occ") < F.lit(M_REGS), F.lit(float(M_REGS)) / v_zero)
        .otherwise(F.lit(1.0))
        .alias("__lnarg__"),
    )
    lns = G.append_ln(staged, "__lnarg__", "__ln__", keep=["occ", "__eraw__"])
    est = F.when(
        (F.col("__eraw__") <= F.lit(2.5 * M_REGS)) & (F.col("occ") < F.lit(M_REGS)),
        F.lit(float(M_REGS)) * F.col("__ln__"),
    ).otherwise(F.col("__eraw__"))
    return lns.crossJoin(n_exact).select(
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
    # distributed top-k FIRST (TakeOrdered), THEN the rank window over
    # ≤ top_k rows — never a single-partition sort of the whole vocabulary
    topped = exact.orderBy(F.desc("exact"), "v").limit(top_k)
    w = Window.orderBy(F.desc("exact"), "v")
    top = topped.withColumn("rank", F.row_number().over(w))
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


BLOOM_BITS = 2016  # m: filter size in bits (32 words x 63 usable bits --
# bit 63 is unused because DuckDB range-checks 1::BIGINT << 63 while Spark
# silently wraps to Long.MIN_VALUE; 63-bit words keep both engines exact)
BLOOM_K = 3  # hash functions (salted portable hashes)
BLOOM_WORDS = BLOOM_BITS // 63


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """(word_idx, word): a Bloom filter of the key set as 32 OR-aggregated
    64-bit words — byte-identical across engines (portable salted hashes →
    bit positions → per-word bit_or). The third verifiable sketch beside
    HLL and count-min: mergeable by OR, one metadata-scale groupBy
    (≤ ``BLOOM_WORDS`` groups)."""
    fans = [
        F.pmod(G.hash63_col(F.concat(F.col(key_col).cast("string"), F.lit(f"|b{s}"))),
               F.lit(BLOOM_BITS))
        for s in range(BLOOM_K)
    ]
    return (
        keys.select(F.explode(F.array(*fans)).alias("pos"))
        .select(
            F.floor(F.col("pos") / F.lit(63)).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 63 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )


def bloom_semijoin(probe: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """(n_probe, n_pass, n_true, n_false_pos): the classic Bloom pre-filter
    audit — probe rows whose key passes the filter of ``keys``, vs exact
    membership. All true members pass (no false negatives, by construction);
    n_false_pos measures the pre-filter's selectivity at the chosen m/k.

    Scale shape: the filter is 32 rows, broadcast; each probe key fans out to
    ``BLOOM_K`` (word, bit) checks joined against the broadcast words and
    AND-reduced per key — a constant-cost map-side pre-filter, which is the
    entire point (drop most of the corpus before an expensive join)."""
    bloom = bloom_build(keys, key_col)
    fans = [
        F.pmod(G.hash63_col(F.concat(F.col(key_col).cast("string"), F.lit(f"|b{s}"))),
               F.lit(BLOOM_BITS))
        for s in range(BLOOM_K)
    ]
    checks = (
        probe.select(F.col(key_col).alias("k"), F.explode(F.array(*fans)).alias("pos"))
        .select(
            "k",
            F.floor(F.col("pos") / F.lit(63)).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 63 AS INT))").alias("bit"),
        )
        .join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "k",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("bit")) != 0).alias("hit"),
        )
        .groupBy("k")
        .agg(F.min(F.col("hit").cast("int")).alias("all_hit"))
    )
    truth = keys.select(F.col(key_col).alias("k")).distinct().withColumn("is_true", F.lit(1))
    audited = checks.join(truth, "k", "left").select(
        "k", "all_hit", F.coalesce("is_true", F.lit(0)).alias("is_true")
    )
    return audited.agg(
        F.count("*").alias("n_probe"),
        F.sum("all_hit").cast("long").alias("n_pass"),
        F.sum("is_true").cast("long").alias("n_true"),
        F.sum(
            F.when((F.col("all_hit") == 1) & (F.col("is_true") == 0), 1).otherwise(0)
        ).cast("long").alias("n_false_pos"),
    )


def _bloom_fan_sql(key_expr: str) -> str:
    parts = []
    for s in range(BLOOM_K):
        h = G.hash63_sql(f"CAST({key_expr} AS VARCHAR) || '|b{s}'")
        parts.append(f"(({h}) % {BLOOM_BITS})")
    return ", ".join(parts)


def bloom_semijoin_sql(probe_sql: str, keys_sql: str, key_col: str) -> str:
    """DuckDB twin of :func:`bloom_semijoin`."""
    return f"""
WITH kfan AS (
  SELECT unnest([{_bloom_fan_sql(key_col)}]) AS pos FROM ({keys_sql})),
bloom AS (
  SELECT CAST(floor(pos / 63) AS BIGINT) AS word_idx,
         bit_or(1::BIGINT << CAST((pos % 63) AS INT)) AS word
  FROM kfan GROUP BY 1),
pfan AS (
  SELECT {key_col} AS k, unnest([{_bloom_fan_sql(key_col)}]) AS pos FROM ({probe_sql})),
checks AS (
  SELECT p.k,
         min(CASE WHEN coalesce(b.word, 0) & (1::BIGINT << CAST((p.pos % 63) AS INT)) <> 0
                  THEN 1 ELSE 0 END) AS all_hit
  FROM pfan p LEFT JOIN bloom b ON CAST(floor(p.pos / 63) AS BIGINT) = b.word_idx
  GROUP BY p.k),
truth AS (SELECT DISTINCT {key_col} AS k, 1 AS is_true FROM ({keys_sql})),
audited AS (
  SELECT c.k, c.all_hit, coalesce(t.is_true, 0) AS is_true
  FROM checks c LEFT JOIN truth t USING (k))
SELECT count(*)::BIGINT AS n_probe,
       CAST(sum(all_hit) AS BIGINT) AS n_pass,
       CAST(sum(is_true) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN all_hit = 1 AND is_true = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM audited
"""


# ------------------------------------------------- per-cell HLL raster band

def cell_hll_pyramid(
    pts: DataFrame, value_col: str, res: int, min_res: int = 0
) -> DataFrame:
    """(level_res, cell_id, occupied, est_distinct): a DISTINCT-COUNT raster
    band at every pyramid level — per-cell HyperLogLog registers computed
    ONCE at the finest resolution from the point scan, then rolled upward by
    register max-merge (HLL's defining property: max is associative, so
    parent registers == registers computed directly from the parent's
    points; the DuckDB twin recomputes every level from raw points and must
    hash-match, which PROVES the merge). The "how many distinct hosts /
    languages / fingerprints per tile" layer of the tile server, at any zoom,
    without ever rescanning the corpus per level.

    ``pts`` is (x, y, <value_col>); estimates use the same byte-exact
    register layout + twin-ln linear-counting correction as
    :func:`hll_distinct`.

    Scale shape: ONE data-scale groupBy((cell, bucket)) with map-side
    combine; each coarser level is a metadata-scale groupBy over ≤ 4^r·256
    register rows; the per-cell fold is a 256-element array op."""
    h = G.hash63_col(F.col(value_col))
    rho = F.when(F.col("w") == 0, F.lit(W_BITS + 1)).otherwise(
        F.lit(W_BITS + 1) - F.length(F.bin(F.col("w")))
    )
    regs = (
        pts.select(
            G.cell_col(F.col("x"), F.col("y"), res).alias("cell_id"),
            h.alias("h"),
        )
        .select(
            "cell_id",
            (F.col("h") % F.lit(M_REGS)).alias("bucket"),
            F.shiftrightunsigned(F.col("h"), P_BITS).alias("w"),
        )
        .withColumn("rho", rho)
        .groupBy("cell_id", "bucket")
        .agg(F.max("rho").alias("mj"))
        .localCheckpoint(eager=True)  # the level loop reuses each level twice
    )

    def _estimate(level_regs: DataFrame, level_res: int) -> DataFrame:
        per = level_regs.withColumn(
            "term", F.expr("1.0 / CAST(shiftleft(1L, mj) AS DOUBLE)")
        )
        terms = F.transform(
            F.array_sort(F.collect_list(F.struct("bucket", "term"))),
            lambda s: s["term"],
        )
        folded = per.groupBy("cell_id").agg(
            F.count("*").alias("occ"),
            F.aggregate(terms, F.lit(0.0), lambda a, b: a + b).alias("s_occ"),
        )
        # staged twin ln (sqlgen.append_ln — round-4 codegen-fallback fix)
        s = (F.lit(M_REGS) - F.col("occ")).cast("double") + F.col("s_occ")
        v_zero = (F.lit(M_REGS) - F.col("occ")).cast("double")
        staged = folded.select(
            "cell_id",
            "occ",
            (F.lit(ALPHA_MM) / s).alias("__eraw__"),
            F.when(F.col("occ") < F.lit(M_REGS), F.lit(float(M_REGS)) / v_zero)
        .otherwise(F.lit(1.0))
        .alias("__lnarg__"),
        )
        lns = G.append_ln(staged, "__lnarg__", "__ln__", keep=["cell_id", "occ", "__eraw__"])
        est = F.when(
            (F.col("__eraw__") <= F.lit(2.5 * M_REGS)) & (F.col("occ") < F.lit(M_REGS)),
            F.lit(float(M_REGS)) * F.col("__ln__"),
        ).otherwise(F.col("__eraw__"))
        return lns.select(
            F.lit(level_res).cast("int").alias("level_res"),
            "cell_id",
            F.col("occ").cast("long").alias("occupied"),
            est.alias("est_distinct"),
        )

    out = _estimate(regs, res)
    cur = regs
    for r in range(res - 1, min_res - 1, -1):
        cur = (
            cur.groupBy(
                G.cell_parent_col(F.col("cell_id")).alias("cell_id"), F.col("bucket")
            )
            .agg(F.max("mj").alias("mj"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(_estimate(cur, r))
    return out


def cell_hll_pyramid_sql(
    pts_sql: str, value_col: str, res: int, min_res: int = 0
) -> str:
    """DuckDB twin of :func:`cell_hll_pyramid` — deliberately computes each
    level's registers DIRECTLY from the raw points (no merge), so a hash
    match proves the Spark side's register max-merge rollup correct."""
    h = G.hash63_sql(value_col)
    wb1 = W_BITS + 1
    levels = []
    for r in range(res, min_res - 1, -1):
        cell = G.cell_sql("x", "y", r)
        levels.append(
            f"""(
  SELECT {r} AS level_res, cell_id, CAST(count(*) AS BIGINT) AS occupied,
         CASE WHEN ({ALPHA_MM!r} / (CAST({M_REGS} - count(*) AS DOUBLE) + list_reduce(
                 list_prepend(0.0, list(1.0 / CAST(1::BIGINT << mj AS DOUBLE) ORDER BY bucket)),
                 (a, b) -> a + b))) <= {2.5 * M_REGS!r}
                 AND count(*) < {M_REGS}
              THEN {float(M_REGS)!r} * {G.ln_sql(f"({float(M_REGS)!r} / CAST({M_REGS} - count(*) AS DOUBLE))")}
              ELSE ({ALPHA_MM!r} / (CAST({M_REGS} - count(*) AS DOUBLE) + list_reduce(
                 list_prepend(0.0, list(1.0 / CAST(1::BIGINT << mj AS DOUBLE) ORDER BY bucket)),
                 (a, b) -> a + b)))
         END AS est_distinct
  FROM (
    SELECT {cell} AS cell_id, h % {M_REGS} AS bucket,
           max(CASE WHEN (h >> {P_BITS}) = 0 THEN {wb1}
                    ELSE {wb1} - length(bin(h >> {P_BITS})) END) AS mj
    FROM hv GROUP BY 1, 2)
  GROUP BY cell_id)"""
        )
    union = "\nUNION ALL\n".join(levels)
    return f"""
WITH hv AS MATERIALIZED (SELECT x, y, {h} AS h FROM ({pts_sql}))
{union}
"""


# ------------------------------------------------------------- DDSketch
# Masson/Rim/Lee 2019: log-bucketed counts give quantiles with RELATIVE
# error ≤ alpha, and the sketch is a plain (bucket → count) table — i.e. a
# groupBy with map-side combine, mergeable across shards/days by adding
# counts. THE quantile structure for 100-TB pipelines: no global sort, no
# rank reconstruction, state bounded by O(log(max/min)/alpha) buckets.


def dd_sketch(
    df: DataFrame, value_col: str, alpha: float = 0.01
) -> DataFrame:
    """(bucket, cnt): DDSketch buckets of the positive values of
    ``value_col`` (zeros/negatives are counted in bucket NULL so totals
    reconcile). bucket = ceil(ln(v)/ln(gamma)), gamma = (1+a)/(1-a) —
    twin-ln, so both engines bucket identically."""
    import math

    inv_ln_gamma = 1.0 / math.log((1.0 + alpha) / (1.0 - alpha))
    # staged twin ln (sqlgen.append_ln — round-4 codegen-fallback fix: the
    # one-expression ln tree in the corpus-pass projection blew the 64 KB
    # method limit). ln runs unconditionally (NaN for v <= 0, discarded by
    # the CASE) — identical bucket values for the v > 0 rows that count.
    vals = df.select(F.col(value_col).cast("double").alias("__v__"))
    lns = G.append_ln(vals, "__v__", "__ln__", keep=["__v__"])
    bucket = F.when(
        F.col("__v__") > 0,
        F.ceil(F.col("__ln__") * F.lit(inv_ln_gamma)).cast("long"),
    )
    return lns.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def dd_quantiles(
    sketch: DataFrame, qs: tuple[float, ...] = (0.5, 0.9, 0.99), alpha: float = 0.01
) -> DataFrame:
    """(q, est): quantile estimates from a DDSketch bucket table — for each
    q, the bucket whose cumulative count first reaches floor(q·(n−1))+1,
    estimated at the bucket's log-midpoint 2·gamma^i/(gamma+1) via twin
    exp/ln (bit-exact across engines). The cumulative walk is a window over
    BUCKET metadata (O(log range/alpha) rows), never values."""
    import math

    from pyspark.sql import Window

    gamma = (1.0 + alpha) / (1.0 - alpha)
    ln_gamma = math.log(gamma)
    # materialize BEFORE filtering: the sketch is O(log range / alpha) rows
    # of METADATA, but its lineage is the ln-bucketing corpus pass. Filtering
    # first would push `bucket IS NOT NULL` below the aggregate onto the
    # bucket EXPRESSION, duplicating the whole twin-ln tree into a Filter
    # node that overflows janino and runs interpreted (measured 33 s for the
    # checkpoint at sf0.1 vs ~4 s this way); and without any checkpoint the
    # corpus pass re-runs once per consumer (total, cumulative walk, probe).
    pos = sketch.localCheckpoint(eager=True).where(F.col("bucket").isNotNull())
    total = pos.agg(F.sum("cnt").cast("long").alias("n"))
    wcum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = pos.withColumn("cum", F.sum("cnt").over(wcum).cast("long")).crossJoin(
        F.broadcast(total)
    )
    spark = sketch.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    # rank needed per q: floor(q*(n-1)) + 1
    need = F.floor(F.col("q") * (F.col("n") - 1).cast("double")).cast("long") + 1
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .withColumn("need", need)
        .where(F.col("cum") >= F.col("need"))
    )
    wpick = Window.partitionBy("q").orderBy("bucket")
    est = F.lit(2.0) * G.exp_col(F.col("bucket").cast("double") * F.lit(ln_gamma)) / F.lit(
        gamma + 1.0
    )
    return (
        hit.withColumn("_rn", F.row_number().over(wpick))
        .where(F.col("_rn") == 1)
        .select("q", F.round(est, 6).alias("est"))
    )


def dd_quantiles_sql(
    src_sql: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    alpha: float = 0.01,
) -> str:
    """DuckDB twin of dd_sketch → dd_quantiles over ``src_sql``."""
    import math

    from ..functions.hexgen import flit

    gamma = (1.0 + alpha) / (1.0 - alpha)
    inv_ln_gamma = 1.0 / math.log(gamma)
    ln_gamma = math.log(gamma)
    qvals = ", ".join(f"({q!r})" for q in qs)
    return f"""
WITH vals AS (
  SELECT CAST({value_col} AS DOUBLE) AS v FROM ({src_sql})),
sk AS (
  SELECT CAST(ceil({G.ln_sql('v')} * {flit(inv_ln_gamma)}) AS BIGINT) AS bucket,
         count(*)::BIGINT AS cnt
  FROM vals WHERE v > 0 GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM sk),
cum AS (
  SELECT bucket, cnt,
         CAST(sum(cnt) OVER (ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM sk),
qs(q) AS (VALUES {qvals}),
hit AS (
  SELECT q, bucket,
         row_number() OVER (PARTITION BY q ORDER BY bucket) AS rn
  FROM cum, qs, tot
  WHERE cum >= CAST(floor(q * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1)
SELECT q,
       round(2.0 * {G.exp_sql(f"(CAST(bucket AS DOUBLE) * {flit(ln_gamma)})")} / {flit(gamma + 1.0)}, 6) AS est
FROM hit WHERE rn = 1
"""


def hll_overlap(a: DataFrame, b: DataFrame, value_col: str) -> DataFrame:
    """Sketch-composition set algebra: estimate |A|, |B|, |A∪B|, |A∩B| of
    two keysets from their HLL registers ONLY — the union sketch is the
    register-wise max (the HLL merge law), the intersection by
    inclusion-exclusion. One row: (est_a, est_b, est_union, est_intersect,
    exact_intersect). The two-crawl overlap question ("how much of today's
    crawl did we already have?") answered without ever joining the raw
    keysets — at 100 TB the sketches are 256 registers each, shipped to one
    node, while the exact join would shuffle both crawls."""

    def regs(df):
        h = G.hash63_col(F.col(value_col))
        r = df.select(h.alias("h")).select(
            (F.col("h") % F.lit(M_REGS)).alias("bucket"),
            F.shiftrightunsigned(F.col("h"), P_BITS).alias("w"),
        )
        rho = F.when(F.col("w") == 0, F.lit(W_BITS + 1)).otherwise(
            F.lit(W_BITS + 1) - F.length(F.bin(F.col("w")))
        )
        return r.withColumn("rho", rho).groupBy("bucket").agg(F.max("rho").alias("mj"))

    def est_from(per_bucket):
        per_bucket = per_bucket.withColumn(
            "term", F.expr("1.0 / CAST(shiftleft(1L, mj) AS DOUBLE)")
        )
        terms = F.transform(
            F.array_sort(F.collect_list(F.struct("bucket", "term"))),
            lambda s: s["term"],
        )
        folded = per_bucket.agg(
            F.count("*").alias("occ"),
            F.aggregate(terms, F.lit(0.0), lambda x, y: x + y).alias("s_occ"),
        )
        # staged twin ln (sqlgen.append_ln — round-4 codegen-fallback fix)
        s = (F.lit(M_REGS) - F.col("occ")).cast("double") + F.col("s_occ")
        v_zero = (F.lit(M_REGS) - F.col("occ")).cast("double")
        staged = folded.select(
            "occ",
            (F.lit(ALPHA_MM) / s).alias("__eraw__"),
            F.when(F.col("occ") < F.lit(M_REGS), F.lit(float(M_REGS)) / v_zero)
        .otherwise(F.lit(1.0))
        .alias("__lnarg__"),
        )
        lns = G.append_ln(staged, "__lnarg__", "__ln__", keep=["occ", "__eraw__"])
        return lns.select(
            F.when(
                (F.col("__eraw__") <= F.lit(2.5 * M_REGS))
                & (F.col("occ") < F.lit(M_REGS)),
                F.lit(float(M_REGS)) * F.col("__ln__"),
            )
            .otherwise(F.col("__eraw__"))
            .alias("est")
        )

    ra, rb = regs(a), regs(b)
    # merge law: union registers = bucket-wise max of the two sketches
    ru = (
        ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("mj").alias("mj"))
    )
    ea = est_from(ra).withColumnRenamed("est", "est_a")
    eb = est_from(rb).withColumnRenamed("est", "est_b")
    eu = est_from(ru).withColumnRenamed("est", "est_union")
    exact = a.select(F.col(value_col).alias("v")).intersect(
        b.select(F.col(value_col).alias("v"))
    ).agg(F.count(F.lit(1)).cast("long").alias("exact_intersect"))
    out = ea.crossJoin(F.broadcast(eb)).crossJoin(F.broadcast(eu)).crossJoin(
        F.broadcast(exact)
    )
    return out.select(
        F.round("est_a", 6).alias("est_a"),
        F.round("est_b", 6).alias("est_b"),
        F.round("est_union", 6).alias("est_union"),
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 6).alias(
            "est_intersect"
        ),
        "exact_intersect",
    )


def hll_overlap_sql(a_sql: str, b_sql: str, value_col: str) -> str:
    """DuckDB twin of :func:`hll_overlap`."""
    h = G.hash63_sql(value_col)
    wb1 = W_BITS + 1

    def regs(src):
        return f"""(
  SELECT bucket, max(rho) AS mj FROM (
    SELECT h % {M_REGS} AS bucket,
           CASE WHEN (h >> {P_BITS}) = 0 THEN {wb1}
                ELSE {wb1} - length(bin(h >> {P_BITS})) END AS rho
    FROM (SELECT {h} AS h FROM ({src}))) GROUP BY bucket)"""

    def est(name):
        return f"""(
  SELECT CASE WHEN e_raw <= {2.5 * M_REGS!r} AND occ < {M_REGS}
              THEN {float(M_REGS)!r} * {G.ln_sql(f"({float(M_REGS)!r} / CAST({M_REGS} - occ AS DOUBLE))")}
              ELSE e_raw END AS est
  FROM (
    SELECT occ, ({ALPHA_MM!r} / (CAST({M_REGS} - occ AS DOUBLE) + s_occ)) AS e_raw
    FROM (
      SELECT CAST(count(*) AS BIGINT) AS occ,
             list_reduce(
               list_prepend(0.0, list(1.0 / CAST(1::BIGINT << mj AS DOUBLE) ORDER BY bucket)),
               (x, y) -> x + y) AS s_occ
      FROM {name})))"""

    return f"""
WITH ra AS MATERIALIZED {regs(a_sql)},
rb AS MATERIALIZED {regs(b_sql)},
ru AS (SELECT bucket, max(mj) AS mj FROM
       (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY bucket),
ea AS (SELECT est AS est_a FROM {est('ra')} x),
eb AS (SELECT est AS est_b FROM {est('rb')} x),
eu AS (SELECT est AS est_union FROM {est('ru')} x),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_intersect FROM (
    SELECT {value_col} AS v FROM ({a_sql})
    INTERSECT
    SELECT {value_col} AS v FROM ({b_sql})))
SELECT round(est_a, 6) AS est_a, round(est_b, 6) AS est_b,
       round(est_union, 6) AS est_union,
       round(est_a + est_b - est_union, 6) AS est_intersect,
       exact_intersect
FROM ea, eb, eu, ex
"""
