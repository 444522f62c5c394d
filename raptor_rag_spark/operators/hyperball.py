"""HyperBall / ANF: per-node neighborhood function + harmonic centrality.

THE web-scale centrality algorithm (Boldi & Vigna, "In-Core Computation of
Geometric Centralities with HyperBall", 2013; Palmer et al. ANF, 2002 — the
method behind the "four degrees of separation" Facebook measurement): every
node carries an HLL sketch of its ball B(v, r) = {u : dist(v, u) ≤ r along
out-edges}; one relaxation round merges each node's sketch into its
in-neighbors' (register-wise max), so after R rounds sketch(v) estimates
|B(v, R)|. Harmonic centrality falls out of the per-round estimates:
H(v) = Σ_{r=1..R} (N_r(v) − N_{r−1}(v)) / r.

Exactness twin: registers are built from the engine's portable 60-bit md5
hash (p = 6 → m = 64 registers per node) and merged by max — byte-identical
in both engines — and the estimate folds 2^(−M_j) terms in register order
(exact powers of two, ordered left fold), so even the float estimates and
harmonic sums hash-match DuckDB bit-for-bit. Same verifiable-sketch design
as sketches.hll_distinct, lifted from one global sketch to one per node.

Scale shape: the state is SPARSE (node, register-index, value) rows —
≤ 64·|V| — and each round is one equi-join of the host-cardinality edge
list with the state plus one map-side-combinable (v, j) max groupBy; skewed
hub in-degrees are absorbed by partial aggregation, never a per-group list.
Exactly HyperBall's systolic cost profile, expressed declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..functions.hexgen import flit

P_BITS = 6
M_REGS = 1 << P_BITS  # 64
W_BITS = 60 - P_BITS  # 54-bit remainder of the 60-bit hash
ALPHA = 0.709  # Flajolet et al. 2007 constant for m = 64
ALPHA_MM = ALPHA * M_REGS * M_REGS
LC_THRESHOLD = 2.5 * M_REGS


def _init_state(hosts: DataFrame) -> DataFrame:
    """(v, j, mj): sparse single-element sketch per host — one row each."""
    h = G.hash63_col(F.col("v"))
    w = F.shiftrightunsigned(h, P_BITS)
    rho = F.when(w == 0, F.lit(W_BITS + 1)).otherwise(
        F.lit(W_BITS + 1) - F.length(F.bin(w))
    )
    return hosts.select(
        "v",
        F.pmod(h, F.lit(M_REGS)).cast("long").alias("j"),
        rho.cast("int").alias("mj"),
    )


def _estimate(state: DataFrame) -> DataFrame:
    """(v, est): the HLL estimate per node from sparse registers — absent
    registers contribute 2^0 = 1 each via the (m − occ) term; ordered fold
    over register index keeps the float sum bit-identical cross-engine."""
    terms = F.transform(
        F.array_sort(F.collect_list(F.struct("j", "term"))),
        lambda s: s["term"],
    )
    per = (
        # 2^-mj is an exact power of two (integer shift, then divide)
        state.withColumn(
            "term", F.expr("1.0 / CAST(shiftleft(1L, mj) AS DOUBLE)")
        )
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.aggregate(terms, F.lit(0.0), lambda a, b: a + b).alias("s_occ"),
        )
    )
    # staged twin ln (sqlgen.append_ln — round-4 codegen-fallback fix: the
    # one-expression ln tree under the CASE blew the 64 KB/method limit)
    v_zero = (F.lit(M_REGS) - F.col("occ")).cast("double")
    staged = per.select(
        "v",
        "occ",
        (F.lit(ALPHA_MM) / (v_zero + F.col("s_occ"))).alias("__eraw__"),
        F.when(F.col("occ") < F.lit(M_REGS), F.lit(float(M_REGS)) / v_zero)
        .otherwise(F.lit(1.0))
        .alias("__lnarg__"),
    )
    lns = G.append_ln(staged, "__lnarg__", "__ln__", keep=["v", "occ", "__eraw__"])
    est = F.when(
        (F.col("__eraw__") <= F.lit(LC_THRESHOLD)) & (F.col("occ") < F.lit(M_REGS)),
        F.lit(float(M_REGS)) * F.col("__ln__"),
    ).otherwise(F.col("__eraw__"))
    return lns.select("v", est.alias("est"))


def hyperball(links: DataFrame, rounds: int = 4) -> DataFrame:
    """links: (src_host, dst_host, ...) — the real extracted link graph.
    Returns (host, reach_est, harmonic): the estimated out-ball size
    |B(host, rounds)| and the rounds-truncated harmonic centrality, both
    rounded to 6 dp. Bounded rounds: like the engine's other fixed-K
    iterations, both engines compute the identical truncated value whether
    or not the sketches have converged."""
    # materialize once: edges join the state EVERY round, and `links` is
    # usually an unmaterialized corpus scan (extract_links regexp over raw
    # pages) — without the barrier each round re-executes it (same defect
    # class as cost-distance's grid re-aggregation)
    edges = links.select(
        F.col("src_host").alias("es"), F.col("dst_host").alias("ed")
    ).distinct().localCheckpoint(eager=True)
    hosts = (
        edges.select(F.col("es").alias("v"))
        .unionByName(edges.select(F.col("ed").alias("v")))
        .distinct()
    )
    state = _init_state(hosts).localCheckpoint(eager=True)
    ests = [_estimate(state)]
    for _ in range(rounds):
        contrib = edges.join(state, state["v"] == edges["ed"]).select(
            F.col("es").alias("v"), "j", "mj"
        )
        state = (
            state.unionByName(contrib)
            .groupBy("v", "j")
            .agg(F.max("mj").alias("mj"))
            .localCheckpoint(eager=True)  # ≤ 64·|V| rows, metadata scale
        )
        ests.append(_estimate(state))
    out = ests[0].select("v", F.col("est").alias("e0"))
    for r in range(1, rounds + 1):
        out = out.join(
            ests[r].select("v", F.col("est").alias(f"e{r}")), "v"
        )
    harmonic = sum(
        (
            (F.col(f"e{r}") - F.col(f"e{r - 1}")) / F.lit(float(r))
            for r in range(1, rounds + 1)
        ),
        F.lit(0.0),
    )
    return out.select(
        F.col("v").alias("host"),
        F.round(F.col(f"e{rounds}"), 6).alias("reach_est"),
        F.round(harmonic, 6).alias("harmonic"),
    )


def _est_sql(state: str) -> str:
    return f"""
  SELECT v,
         CASE WHEN ({flit(ALPHA_MM)} / (CAST({M_REGS} - occ AS DOUBLE) + s_occ))
                     <= {flit(LC_THRESHOLD)}
                AND occ < {M_REGS}
              THEN {flit(float(M_REGS))} * {G.ln_sql(f"({flit(float(M_REGS))} / CAST({M_REGS} - occ AS DOUBLE))")}
              ELSE {flit(ALPHA_MM)} / (CAST({M_REGS} - occ AS DOUBLE) + s_occ)
         END AS est
  FROM (
    SELECT v, CAST(count(*) AS BIGINT) AS occ,
           list_reduce(
             list_prepend(0.0,
               list(1.0 / CAST(1::BIGINT << mj AS DOUBLE) ORDER BY j)),
             (a, b) -> a + b) AS s_occ
    FROM {state} GROUP BY v)"""


def hyperball_sql(links_sql: str, rounds: int = 4) -> str:
    """DuckDB twin of :func:`hyperball`. ``links_sql`` must yield
    (src_host, dst_host, ...)."""
    h = G.hash63_sql("v")
    wb1 = W_BITS + 1
    ctes = [
        f"links AS ({links_sql})",
        "ed AS MATERIALIZED (SELECT DISTINCT src_host AS es, dst_host"
        " AS ed FROM links)",
        """hosts AS (SELECT DISTINCT v FROM (
     SELECT es AS v FROM ed UNION ALL SELECT ed AS v FROM ed))""",
        f"""s0 AS MATERIALIZED (
  SELECT v, CAST(h % {M_REGS} AS BIGINT) AS j,
         CAST(CASE WHEN h >> {P_BITS} = 0 THEN {wb1}
                   ELSE {wb1} - length(bin(h >> {P_BITS})) END AS INT) AS mj
  FROM (SELECT v, {h} AS h FROM hosts))""",
        f"e0 AS MATERIALIZED ({_est_sql('s0')})",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""s{r} AS MATERIALIZED (
  SELECT v, j, max(mj) AS mj FROM (
    SELECT l.es AS v, s.j, s.mj FROM ed l JOIN s{r - 1} s ON s.v = l.ed
    UNION ALL
    SELECT v, j, mj FROM s{r - 1}
  ) GROUP BY 1, 2)"""
        )
        ctes.append(f"e{r} AS MATERIALIZED ({_est_sql(f's{r}')})")
    harm = " + ".join(
        f"(e{r}.est - e{r - 1}.est) / {flit(float(r))}"
        for r in range(1, rounds + 1)
    )
    joins = " ".join(f"JOIN e{r} USING (v)" for r in range(1, rounds + 1))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v AS host, round(e{rounds}.est, 6) AS reach_est,
       round(0.0 + {harm}, 6) AS harmonic
FROM e0 {joins}"""
    )
