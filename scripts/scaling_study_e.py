"""Scaling study E — N vs 4N parallelism for the SEARCH and LAKEHOUSE legs.

Studies B/C/D cover the flagship build pipeline (chunk→embed→cell→rollup).
This study closes the round-4 verdict's last extrapolation gap: the two
subsystems a 100-TB user runs hottest — the full-text search stack (postings
index build + BM25/QL/RRF/snippets retrieval) and the z-ordered lakehouse
write+scan — measured at local[N] and local[4N] on the SAME materialized
page corpus, with order-insensitive exact output signatures that must match
across parallelism.

Method identical to scripts/scaling_bench.py: fresh JVM per session, both
input sizes back-to-back within one session (same host phase), sessions
alternating between core counts, min pair wall per leg, marginal rate
Δdocs/Δwall as the cluster-throughput estimator (fixed JVM/stage cost
amortizes to ~0 at 10^12 docs).

Usage:
  python scripts/scaling_study_e.py                    # full study → BENCH.md append
  python scripts/scaling_study_e.py --run-one N LO HI  # single session (JSON)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("SCALING_PAGES", "250000"))
N_SMALL = int(os.environ.get("SCALING_CORES", "2"))
REPEATS = int(os.environ.get("SCALING_REPEATS", "3"))
N_BIG = 4 * N_SMALL
# lake leg: points per page (explode fan-out) — at 1 point/page the z-order
# write+scan is seconds and fixed-cost-dominated even at 1M pages, so the
# marginal rate degenerates; 16 points/page makes the write the measured cost
LAKE_PTS_PER_PAGE = int(os.environ.get("SCALING_LAKE_PTS", "16"))


def input_path(n_pages: int) -> str:
    return f"/tmp/scaling_pages_{n_pages}.parquet"


def materialize_input(n_pages: int) -> None:
    if os.path.exists(input_path(n_pages)):
        return
    from raptor_rag_spark.session import get_spark
    from raptor_rag_spark.sources.pages import generate_pages

    spark = get_spark("scaling-gen", cores=N_BIG)
    spark.sparkContext.setLogLevel("ERROR")
    generate_pages(spark, n_pages, partitions=64).write.mode("overwrite").parquet(
        input_path(n_pages)
    )
    spark.stop()


def run_one(cores: int, n_lo: int, n_hi: int) -> None:
    from pyspark.sql import functions as F

    from raptor_rag_spark.functions import sqlgen as G
    from raptor_rag_spark.operators.ranking import (
        bm25_index,
        bm25_rank,
        index_stats,
        ql_rank,
        rrf_fuse,
    )
    from raptor_rag_spark.plans.contract import QUERY_TEXTS
    from raptor_rag_spark.session import get_spark, warm_python_workers
    from raptor_rag_spark.sources.lakehouse import LakeTable

    spark = get_spark(f"scaling-e-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)
    bq = spark.createDataFrame(
        [(i, t) for i, t in enumerate(QUERY_TEXTS)], "query_id int, qtext string"
    )

    out = {"cores": cores, "runs": {}}
    for n_pages in (n_lo, n_hi):
        pages = spark.read.parquet(input_path(n_pages))
        docs = pages.select(F.col("url").alias("doc_id"), "text")

        # --- search leg: postings build + 3 rankers + fusion, one signature
        t0 = time.time()
        postings = bm25_index(docs).localCheckpoint(eager=True)
        # battery statistics computed ONCE (index_stats) — the round-5
        # scaling fix: without sharing, each ranker re-derived dl/df/stats
        # with full index passes and the fixed passes capped N→4N at ~0.55
        stats = index_stats(postings)
        a = bm25_rank(None, bq, top_k=10, max_df_ratio=(9, 10), postings=postings,
                      shared=stats)
        b = ql_rank(None, bq, top_k=10, postings=postings, shared=stats)
        fused = rrf_fuse(a, b, top_k=10)
        sig_col = G.hash63_col(
            F.concat_ws(
                "|", F.col("query_id"), F.col("doc_id"), F.round(F.col("score"), 9)
            )
        )
        srow = fused.agg(
            F.count("*").alias("n"),
            F.sum(sig_col.cast("decimal(38,0)")).alias("sig"),
        ).collect()[0]
        search_wall = time.time() - t0

        # --- lake leg: z-ordered multi-file write + bbox-pruned scan.
        # Points derive deterministically from the url hash (pure column
        # arithmetic — no embedding pass; this leg measures the LAKEHOUSE).
        t0 = time.time()
        k = F.explode(F.sequence(F.lit(0), F.lit(LAKE_PTS_PER_PAGE - 1))).alias("k")
        fanned = pages.select("url", k)
        h = G.hash63_col(F.concat_ws("|", F.col("url"), F.col("k")))
        pts = fanned.select(
            F.concat_ws("|", F.col("url"), F.col("k")).alias("pid"),
            ((h % 1000000).cast("double") / 1000000.0).alias("x"),
            (((h / 1000000).cast("long") % 1000000).cast("double") / 1000000.0).alias("y"),
        )
        # lake table on tmpfs (the executor-local-NVMe stand-in, same
        # methodology as the shuffle dirs in session.get_spark): on /tmp's
        # single virtio disk the z-order write is IO-bound and the leg
        # measures the disk, not the engine's parallelism
        lake_root = "/dev/shm/scale_lake" if os.path.isdir("/dev/shm") else None
        if lake_root:
            os.makedirs(lake_root, exist_ok=True)
        lake_dir = tempfile.mkdtemp(prefix=f"scale_lake_{cores}_{n_pages}_", dir=lake_root)
        try:
            t = LakeTable(lake_dir, stats_cols=(LakeTable.ZKEY,))
            t.append_zordered(pts, res=8, n_files=64)
            scanned = t.scan_bbox(spark, 0.2, 0.3, 0.5, 0.6, res=8)
            lsig_col = G.hash63_col(F.concat_ws("|", F.col("pid")))
            lrow = scanned.agg(
                F.count("*").alias("n"),
                F.sum(lsig_col.cast("decimal(38,0)")).alias("sig"),
            ).collect()[0]
        finally:
            shutil.rmtree(lake_dir, ignore_errors=True)
        lake_wall = time.time() - t0

        spark.catalog.clearCache()
        out["runs"][str(n_pages)] = {
            "n_pages": n_pages,
            "search_wall_s": round(search_wall, 2),
            "lake_wall_s": round(lake_wall, 2),
            "search_sig": (int(srow["n"]), int(srow["sig"])),
            "lake_sig": (int(lrow["n"]), int(lrow["sig"])),
        }
    lo, hi = out["runs"][str(n_lo)], out["runs"][str(n_hi)]
    out["marginal"] = {
        leg: round(
            (n_hi - n_lo) / max(hi[f"{leg}_wall_s"] - lo[f"{leg}_wall_s"], 1e-9), 1
        )
        for leg in ("search", "lake")
    }
    out["pair_wall_s"] = round(
        sum(lo[k] + hi[k] for k in ("search_wall_s", "lake_wall_s")), 2
    )
    print(json.dumps(out))


def launch(cores: int, n_lo: int, n_hi: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--run-one", str(cores), str(n_lo), str(n_hi)],
        capture_output=True,
        text=True,
        check=True,
        timeout=5400,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--run-one":
        run_one(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return 0

    n_lo, n_hi = N_PAGES, 4 * N_PAGES
    materialize_input(n_lo)
    materialize_input(n_hi)
    sessions: dict[int, list] = {N_SMALL: [], N_BIG: []}
    for rep in range(REPEATS):
        for cores in (N_SMALL, N_BIG):
            r = launch(cores, n_lo, n_hi)
            sessions[cores].append(r)
            print(json.dumps({"rep": rep, "cores": cores,
                              "pair_wall_s": r["pair_wall_s"],
                              "marginal": r["marginal"],
                              "runs": r["runs"]}))
    sig_ok = True
    for n in (n_lo, n_hi):
        for leg in ("search_sig", "lake_sig"):
            vals = {
                tuple(r["runs"][str(n)][leg])
                for rs in sessions.values()
                for r in rs
            }
            if len(vals) != 1:
                sig_ok = False

    # Noise-robust estimator (the repo's min-wall convention — host phases
    # swing identical legs 30-50%, and noise only ever ADDS time): per
    # (cores, size, leg) take the MIN wall across all sessions, then the
    # marginal rate from the min walls. A per-session pairing would couple
    # each efficiency estimate to two arbitrary host phases (measured range
    # 0.23-1.02 across rep pairings on identical code).
    minw = {
        c: {
            n: {
                leg: min(r["runs"][str(n)][f"{leg}_wall_s"] for r in sessions[c])
                for leg in ("search", "lake")
            }
            for n in (n_lo, n_hi)
        }
        for c in sessions
    }
    marg = {
        c: {
            leg: round(
                (n_hi - n_lo)
                / max(minw[c][n_hi][leg] - minw[c][n_lo][leg], 1e-9),
                1,
            )
            for leg in ("search", "lake")
        }
        for c in minw
    }
    eff = {
        leg: round(marg[N_BIG][leg] / (4.0 * marg[N_SMALL][leg]), 3)
        for leg in ("search", "lake")
    }
    report = {
        "n_pages": [n_lo, n_hi],
        "min_walls": {str(c): minw[c] for c in minw},
        "marginal_min_wall": {str(c): marg[c] for c in marg},
        "scaling_efficiency_marginal": eff,
        "exact_output_match": sig_ok,
    }
    print(json.dumps(report))

    rows = "\n".join(
        f"| local[{c}] | {n:,} | {minw[c][n]['search']} "
        f"| {minw[c][n]['lake']} |"
        for c in (N_SMALL, N_BIG)
        for n in (n_lo, n_hi)
    )
    md = f"""

## Study E — search stack + lakehouse at N vs 4N ({datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")})

Round-4 verdict #4: the flagship-pipeline studies (B/C/D) left the search
and lakehouse subsystems' scaling inferred, not measured. Same method as the
main study (fresh JVM per session, both sizes per session, {REPEATS}×
alternating repeats, min pair wall, marginal Δdocs/Δwall): **search leg** =
postings index build + BM25 + Dirichlet-QL + RRF fusion over the page
corpus; **lake leg** = z-ordered 64-file lakehouse write + bbox-pruned scan
(points derived from url hashes by pure column arithmetic, so the leg
measures the lakehouse, not an embedding pass).

| parallelism | pages | min search wall (s) | min lake wall (s) |
|---|---|---|---|
{rows}

- **Marginal throughput (docs/sec, min-wall estimator over {REPEATS} sessions/leg):**
  search local[{N_SMALL}] = {marg[N_SMALL]["search"]:,.0f}, local[{N_BIG}] = {marg[N_BIG]["search"]:,.0f};
  lake local[{N_SMALL}] = {marg[N_SMALL]["lake"]:,.0f}, local[{N_BIG}] = {marg[N_BIG]["lake"]:,.0f}
- **Scaling efficiency (marginal):** search = {eff["search"]:.3f}, lake = {eff["lake"]:.3f} (target ≥ 0.8)
- **Exact output match:** {"YES" if sig_ok else "NO"} — fused top-k result
  signature and bbox-scan row signature identical across parallelism and
  repeats at both sizes.
"""
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"),
        "a",
    ) as f:
        f.write(md)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
