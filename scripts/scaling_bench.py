"""Two-parallelism scaling study — the north rule's N vs 4N executor evidence.

No real cluster exists in this sandbox, so the same job runs at local[N] and
local[4N] (fresh JVM each, via subprocess) on the SAME input: a deterministic
synthetic Common-Crawl page table (pure function of row id → byte-identical
across parallelism). The job is the end-to-end headline pipeline:

    generate pages → extract text → chunk → embed (Arrow UDF) → xy project →
    cell encode → per-level tile rollup (3 levels, salted hot cells)

We report pages/sec at both levels, scaling efficiency T_N/(k·T_kN), and an
order-insensitive exact output signature (sum of portable hashes of every
(node_id, cell_id, token_count) row) that MUST be identical — the "100% match
on join rows + tile assignments" criterion at two cluster sizes.

Usage:
  python scripts/scaling_bench.py                  # full study → BENCH.md
  python scripts/scaling_bench.py --run-one N PAGES  # single measurement (JSON)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("SCALING_PAGES", "30000"))
N_SMALL = int(os.environ.get("SCALING_CORES", "8"))
N_BIG = 4 * N_SMALL


def run_one(cores: int, n_pages: int) -> None:
    from pyspark.sql import functions as F

    from raptor_rag_spark.config import ClusterTreeConfig
    from raptor_rag_spark.functions import sqlgen as G
    from raptor_rag_spark.plans.build_tree import build_tree
    from raptor_rag_spark.session import get_spark
    from raptor_rag_spark.sources.pages import generate_pages

    spark = get_spark(f"scaling-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    pages = generate_pages(spark, n_pages)
    docs = pages.select(F.col("url").alias("doc_id"), "text")
    cfg = ClusterTreeConfig(max_tokens=64, num_layers=3, max_resolution=8)
    tree = build_tree(docs, cfg, id_col="doc_id")
    sig_col = G.hash63_col(
        F.concat_ws("|", F.col("node_id"), F.col("cell_id"), F.col("token_count"))
    )
    row = tree.agg(
        F.count("*").alias("n"),
        F.sum(sig_col.cast("decimal(38,0)")).alias("sig"),
        F.sum(F.col("cell_id").cast("decimal(38,0)")).alias("cell_sum"),
    ).collect()[0]
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n_pages,
                "wall_s": round(wall, 2),
                "pages_per_sec": round(n_pages / wall, 2),
                "n_nodes": row["n"],
                "signature": int(row["sig"]),
                "cell_sum": int(row["cell_sum"]),
            }
        )
    )


def launch(cores: int, n_pages: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--run-one", str(cores), str(n_pages)],
        capture_output=True,
        text=True,
        check=True,
        timeout=3600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--run-one":
        run_one(int(sys.argv[2]), int(sys.argv[3]))
        return 0

    small = launch(N_SMALL, N_PAGES)
    big = launch(N_BIG, N_PAGES)
    match = (small["signature"], small["n_nodes"], small["cell_sum"]) == (
        big["signature"],
        big["n_nodes"],
        big["cell_sum"],
    )
    eff = small["wall_s"] / (4.0 * big["wall_s"])
    speedup = small["wall_s"] / big["wall_s"]
    report = {
        "n_pages": N_PAGES,
        "small": small,
        "big": big,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "exact_output_match": match,
    }
    print(json.dumps(report))

    md = f"""# BENCH — scaling study (N vs 4N parallelism)

Generated {datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")} by `scripts/scaling_bench.py`.

North-rule criterion: throughput scaling efficiency ≥ 0.8 from N to 4N
executors, with 100% output match. No real cluster exists in this sandbox, so
the same job runs at `local[{N_SMALL}]` and `local[{N_BIG}]` (fresh JVM each) on the
**same input**: {N_PAGES:,} deterministic synthetic Common-Crawl pages
(`raptor_rag_spark/sources/pages.py` — every row a pure function of its id).

Job: generate → extract text → chunk → hash-ngram embed (Arrow UDF) → xy
project → quadkey cell encode → 3-level salted tile rollup (the headline
pipeline of BASELINE.json's metric).

| parallelism | wall (s) | pages/sec |
|---|---|---|
| local[{N_SMALL}] (N) | {small["wall_s"]} | {small["pages_per_sec"]} |
| local[{N_BIG}] (4N) | {big["wall_s"]} | {big["pages_per_sec"]} |

- **Speedup (N→4N):** {speedup:.2f}×
- **Scaling efficiency:** {eff:.3f} (speedup / 4)
- **Exact output match:** {"YES" if match else "NO"} — order-insensitive
  signature over every (node_id, cell_id, token_count) row:
  `{small["signature"]}` at N vs `{big["signature"]}` at 4N;
  {small["n_nodes"]} nodes both runs.

Determinism notes: node ids are portable 60-bit hashes of (url, chunk_idx);
cell assignment is pure column arithmetic; per-cell summaries sort members by
node_id inside each applyInPandas group — so output is independent of
partitioning and parallelism by construction, and the signature check proves
it per run.
"""
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"), "w") as f:
        f.write(md)
    print("wrote BENCH.md")
    return 0 if match else 1


if __name__ == "__main__":
    raise SystemExit(main())
