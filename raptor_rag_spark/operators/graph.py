"""Host-level link graph + PageRank over the web-pages corpus.

The webtext-side graph surface: a crawl curation pipeline ranks hosts by
link authority (the classic PageRank prior used for crawl scheduling and
quality weighting — e.g. Common Crawl's harmonic-centrality host ranks).
The link graph here is derived deterministically from the pages table:
each page contributes one out-link from its host to a pseudo-target host
chosen by a stable hash of its url over the dense host-id space — the same
"synthesize structure from hashes" trick the dedup/multimodal families use
so both engines (Spark and the DuckDB oracle) rebuild the identical graph
from the identical bits.

Scale shape (100 TB of pages):
- The pages scan collapses to a HOST-level graph in one groupBy (hosts are
  millions where pages are trillions), so the iteration runs on metadata-
  scale tables; the only data-scale work is the initial parse+groupBy.
- Each PageRank round is edges ⋈ ranks (broadcast — ranks is |hosts| rows)
  then ONE groupBy(dst) with map-side partial aggregation; K rounds = K
  bounded shuffles of the edge table, the standard distributed formulation.
- Dense host ids come from a window rank over the host table; that is a
  single-partition sort of a metadata-scale table (NOT the pages table) —
  the same tradeoff as the per-host rollup in operators/webops.py.

Cross-engine exactness: contributions rank/out_deg are per-row double ops
(twin-identical); cross-row sums go through DECIMAL(28,15); the damping
constants are Python-computed once and injected into both twins verbatim.

Reference role: the reference has no graph surface; this is corpus-scale
curation infrastructure per SURVEY.md §2.1 (crawl-quality priors), the
page-level analog of host_quality_filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from .webops import parse_urls

DAMPING = 0.85
BASE_NUM = 1.0 - DAMPING  # computed ONCE; injected into both twins


def host_nodes(pages: DataFrame) -> DataFrame:
    """(host_id, host, out_deg): dense-id host table. out_deg = pages per
    host (each page emits exactly one out-link, so no dangling nodes by
    construction — every host has ≥1 page ⇒ ≥1 out-edge)."""
    hosts = parse_urls(pages).groupBy("host").agg(F.count("*").alias("out_deg"))
    w = Window.orderBy("host")
    return hosts.withColumn("host_id", (F.row_number().over(w) - 1).cast("long")).select(
        "host_id", "host", "out_deg"
    )


def host_link_edges(pages: DataFrame, nodes: DataFrame) -> DataFrame:
    """(src, dst, w, out_deg): weighted host→host edges. Each page links its
    host to host ``hash63(url) mod n_hosts``; parallel edges collapse into a
    weight (one groupBy with map-side combine over the pages scan)."""
    n_hosts = nodes.agg(F.count("*").alias("n_hosts"))
    parsed = parse_urls(pages).select("url", "host")
    e = (
        parsed.join(F.broadcast(nodes.select("host", "host_id")), "host")
        .crossJoin(F.broadcast(n_hosts))
        .select(
            F.col("host_id").alias("src"),
            F.pmod(G.hash63_col(F.col("url")), F.col("n_hosts")).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    return e.join(
        F.broadcast(nodes.select(F.col("host_id").alias("src"), "out_deg")), "src"
    )


def pagerank(nodes: DataFrame, edges: DataFrame, iterations: int = 5) -> DataFrame:
    """(host_id, rank): PageRank after a FIXED number of power-iteration
    rounds (fixed K ⇒ the DuckDB twin unrolls into chained CTEs).

        rank⁰ = 1/N
        rankᵏ = (1−d)/N + d · Σ_in  w·(rankᵏ⁻¹_src / out_deg_src)

    Sums in exact DECIMAL; hosts with no in-links keep the (1−d)/N floor
    via coalesce(·, 0.0) (adding d·0.0 is IEEE-exact)."""
    dec = "decimal(28,15)"
    # materialize the (host-cardinality, metadata-scale) graph ONCE: every
    # iteration below references base and edges, and Catalyst does not
    # deduplicate repeated subplans — without the checkpoint the upstream
    # parse + host groupBy would re-execute once per round (K+1 corpus scans
    # for host_pagerank). ranks is checkpointed per round for the same
    # reason: the broadcast side would otherwise re-evaluate rounds 1..k−1.
    n_hosts = nodes.agg(F.count("*").alias("n_hosts"))
    base = nodes.select("host_id").crossJoin(F.broadcast(n_hosts)).select(
        "host_id",
        (F.lit(BASE_NUM) / F.col("n_hosts").cast("double")).alias("base"),
        (F.lit(1.0) / F.col("n_hosts").cast("double")).alias("rank"),
    ).localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    ranks = base.select("host_id", "rank")
    for _ in range(iterations):
        contrib = (
            edges.join(F.broadcast(ranks.withColumnRenamed("host_id", "src")), "src")
            .select(
                "dst",
                (
                    F.col("w").cast("double")
                    * (F.col("rank") / F.col("out_deg").cast("double"))
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum(F.col("c").cast(dec)).cast("double").alias("s"))
        )
        ranks = (
            base.select("host_id", "base")
            .join(contrib.withColumnRenamed("dst", "host_id"), "host_id", "left")
            .select(
                "host_id",
                (
                    F.col("base")
                    + F.lit(DAMPING) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def host_pagerank(pages: DataFrame, iterations: int = 5) -> DataFrame:
    """(host, out_deg, rank): the end-to-end composite — parse → host graph
    → K PageRank rounds → named hosts."""
    nodes = host_nodes(pages)
    edges = host_link_edges(pages, nodes)
    ranks = pagerank(nodes, edges, iterations)
    return nodes.join(ranks, "host_id").select("host", "out_deg", "rank")


def host_pagerank_sql(pages_sql: str, url_re: str, iterations: int = 5) -> str:
    """DuckDB twin of :func:`host_pagerank`. ``pages_sql`` selects url (and
    any other page columns); ``url_re`` is the shared URL regex."""
    dec = "DECIMAL(28,15)"
    ctes = [
        f"parsed AS (SELECT url, regexp_extract(url, '{url_re}', 2) AS host FROM ({pages_sql}))",
        "hosts AS (SELECT host, CAST(count(*) AS BIGINT) AS out_deg FROM parsed GROUP BY host)",
        "nid AS (SELECT host, out_deg, CAST(row_number() OVER (ORDER BY host) - 1 AS BIGINT) AS host_id FROM hosts)",
        "c AS (SELECT CAST(count(*) AS BIGINT) AS n_hosts FROM nid)",
        f"""e0 AS (SELECT n.host_id AS src,
               ({G.hash63_sql('p.url')} % (SELECT n_hosts FROM c)) AS dst
        FROM parsed p JOIN nid n ON p.host = n.host)""",
        "ew AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM e0 GROUP BY src, dst)",
        "edges AS (SELECT ew.src, ew.dst, ew.w, n.out_deg FROM ew JOIN nid n ON ew.src = n.host_id)",
        "r0 AS (SELECT host_id, (1.0 / CAST((SELECT n_hosts FROM c) AS DOUBLE)) AS rank FROM nid)",
    ]
    base = f"({BASE_NUM!r} / CAST((SELECT n_hosts FROM c) AS DOUBLE))"
    for k in range(1, iterations + 1):
        ctes.append(
            f"""r{k} AS (
  SELECT nid.host_id,
         ({base} + {DAMPING!r} * coalesce(s.sc, 0.0)) AS rank
  FROM nid LEFT JOIN (
    SELECT e.dst AS host_id,
           CAST(sum(CAST((CAST(e.w AS DOUBLE) * (r.rank / CAST(e.out_deg AS DOUBLE))) AS {dec})) AS DOUBLE) AS sc
    FROM edges e JOIN r{k - 1} r ON e.src = r.host_id GROUP BY e.dst) s
  ON nid.host_id = s.host_id)"""
        )
    return f"""
WITH {', '.join(ctes)}
SELECT n.host, n.out_deg, r.rank
FROM nid n JOIN r{iterations} r ON n.host_id = r.host_id
"""


def link_pagerank(links: DataFrame, iterations: int = 5) -> DataFrame:
    """(host, out_deg, rank): PageRank over REAL extracted edges
    (curation.extract_links: src_host, dst_host, n_links) instead of the
    hash-synthesized graph. Hosts that only ever appear as link targets are
    dangling (out_deg = 0): they receive rank but contribute none — the
    standard damping-floor treatment; they can never be join sources so no
    division by zero arises.

    Scale shape identical to host_pagerank: the edge list is already
    host-cardinality, each round is one broadcast join + one map-side-
    combined groupBy."""
    hosts = (
        links.select(F.col("src_host").alias("host"))
        .unionByName(links.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    out = links.groupBy(F.col("src_host").alias("host")).agg(
        F.sum("n_links").alias("deg")
    )
    w = Window.orderBy("host")
    nodes = (
        hosts.join(out, "host", "left")
        .select("host", F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("out_deg"))
        .withColumn("host_id", (F.row_number().over(w) - 1).cast("long"))
    )
    sid = nodes.select(F.col("host").alias("src_host"), F.col("host_id").alias("src"), "out_deg")
    did = nodes.select(F.col("host").alias("dst_host"), F.col("host_id").alias("dst"))
    edges = (
        links.join(F.broadcast(sid), "src_host")
        .join(F.broadcast(did), "dst_host")
        .select("src", "dst", F.col("n_links").alias("w"), "out_deg")
    )
    ranks = pagerank(nodes, edges, iterations)
    return nodes.join(ranks, "host_id").select("host", "out_deg", "rank")


def link_pagerank_sql(links_sql: str, iterations: int = 5) -> str:
    """DuckDB twin of :func:`link_pagerank`. ``links_sql`` must yield
    (src_host, dst_host, n_links)."""
    dec = "DECIMAL(28,15)"
    ctes = [
        f"links AS ({links_sql})",
        """hosts AS (SELECT DISTINCT host FROM (
           SELECT src_host AS host FROM links
           UNION ALL SELECT dst_host AS host FROM links))""",
        """odeg AS (SELECT src_host AS host, CAST(sum(n_links) AS BIGINT) AS deg
           FROM links GROUP BY src_host)""",
        """nid AS (SELECT h.host, coalesce(o.deg, 0) AS out_deg,
             CAST(row_number() OVER (ORDER BY h.host) - 1 AS BIGINT) AS host_id
           FROM hosts h LEFT JOIN odeg o ON h.host = o.host)""",
        "c AS (SELECT CAST(count(*) AS BIGINT) AS n_hosts FROM nid)",
        """edges AS (SELECT s.host_id AS src, d.host_id AS dst,
             CAST(l.n_links AS BIGINT) AS w, s.out_deg
           FROM links l
           JOIN nid s ON l.src_host = s.host
           JOIN nid d ON l.dst_host = d.host)""",
        "r0 AS (SELECT host_id, (1.0 / CAST((SELECT n_hosts FROM c) AS DOUBLE)) AS rank FROM nid)",
    ]
    base = f"({BASE_NUM!r} / CAST((SELECT n_hosts FROM c) AS DOUBLE))"
    for k in range(1, iterations + 1):
        ctes.append(
            f"""r{k} AS (
  SELECT nid.host_id,
         ({base} + {DAMPING!r} * coalesce(s.sc, 0.0)) AS rank
  FROM nid LEFT JOIN (
    SELECT e.dst AS host_id,
           CAST(sum(CAST((CAST(e.w AS DOUBLE) * (r.rank / CAST(e.out_deg AS DOUBLE))) AS {dec})) AS DOUBLE) AS sc
    FROM edges e JOIN r{k - 1} r ON e.src = r.host_id GROUP BY e.dst) s
  ON nid.host_id = s.host_id)"""
        )
    return f"""
WITH {', '.join(ctes)}
SELECT n.host, n.out_deg, r.rank
FROM nid n JOIN r{iterations} r ON n.host_id = r.host_id
"""


def triangle_count(links: DataFrame) -> DataFrame:
    """(host, deg, triangles): per-host triangle participation over the REAL
    extracted link graph (curation.extract_links), treating links as
    undirected simple edges (self-loops and parallel edges collapse) — the
    clustering-structure signal crawl curation uses to separate organic link
    neighborhoods (triangle-rich) from spam farms and link rings
    (star-shaped, triangle-poor).

    Scale shape — the standard degree-ordered wedge join: each undirected
    edge is oriented from the lower (deg, host) endpoint to the higher, which
    bounds every vertex's out-degree by O(sqrt(m)) on real graphs, so the
    wedge self-join is near-linear instead of sum-of-squares-of-degrees; the
    closing edge check is one more equi-join. Dense ids come from a window
    rank over the metadata-scale host table (same tradeoff as link_pagerank).
    Each triangle is found exactly once (at its ≺-minimal vertex) and then
    credited to all 3 corners by an explode + groupBy."""
    und = (
        links.where(F.col("src_host") != F.col("dst_host"))
        .select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("host"))
        .unionByName(und.select(F.col("b").alias("host")))
        .groupBy("host")
        .agg(F.count("*").alias("deg"))
    )
    w = Window.orderBy("deg", "host")
    nodes = deg.withColumn("rid", (F.row_number().over(w) - 1).cast("long"))
    rid_a = nodes.select(F.col("host").alias("a"), F.col("rid").alias("ra"))
    rid_b = nodes.select(F.col("host").alias("b"), F.col("rid").alias("rb"))
    oriented = (
        und.join(F.broadcast(rid_a), "a")
        .join(F.broadcast(rid_b), "b")
        .select(
            F.least("ra", "rb").alias("u"),
            F.greatest("ra", "rb").alias("v"),
        )
    )
    e1 = oriented.select(F.col("u").alias("tu"), F.col("v").alias("tv"))
    e2 = oriented.select(F.col("u").alias("tu"), F.col("v").alias("tw"))
    wedges = e1.join(e2, "tu").where(F.col("tv") < F.col("tw"))
    closing = oriented.select(F.col("u").alias("tv"), F.col("v").alias("tw"))
    tris = wedges.join(closing, ["tv", "tw"])
    corner = (
        tris.select(F.explode(F.array("tu", "tv", "tw")).alias("rid"))
        .groupBy("rid")
        .agg(F.count("*").alias("tri"))
    )
    return (
        nodes.join(corner, "rid", "left")
        .select("host", "deg", F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("triangles"))
    )


def triangle_count_sql(links_sql: str) -> str:
    """DuckDB twin of :func:`triangle_count`. ``links_sql`` must yield
    (src_host, dst_host, n_links)."""
    return f"""
WITH und AS (
  SELECT DISTINCT least(src_host, dst_host) AS a, greatest(src_host, dst_host) AS b
  FROM ({links_sql}) WHERE src_host <> dst_host),
deg AS (
  SELECT host, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS host FROM und UNION ALL SELECT b AS host FROM und)
  GROUP BY host),
nodes AS (
  SELECT host, deg, CAST(row_number() OVER (ORDER BY deg, host) - 1 AS BIGINT) AS rid
  FROM deg),
oriented AS (
  SELECT least(na.rid, nb.rid) AS u, greatest(na.rid, nb.rid) AS v
  FROM und
  JOIN nodes na ON und.a = na.host
  JOIN nodes nb ON und.b = nb.host),
wedges AS (
  SELECT e1.u AS tu, e1.v AS tv, e2.v AS tw
  FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u
  WHERE e1.v < e2.v),
tris AS (
  SELECT w.tu, w.tv, w.tw FROM wedges w
  JOIN oriented c ON c.u = w.tv AND c.v = w.tw),
corner AS (
  SELECT rid, CAST(count(*) AS BIGINT) AS tri FROM (
    SELECT tu AS rid FROM tris
    UNION ALL SELECT tv AS rid FROM tris
    UNION ALL SELECT tw AS rid FROM tris)
  GROUP BY rid)
SELECT n.host, n.deg, CAST(coalesce(c.tri, 0) AS BIGINT) AS triangles
FROM nodes n LEFT JOIN corner c ON n.rid = c.rid
"""


def kcore(links: DataFrame, k: int = 2, rounds: int = 8) -> DataFrame:
    """(host, deg): hosts surviving ``rounds`` rounds of k-core peeling of
    the undirected link graph (repeatedly delete every vertex with degree
    < k), with their degree INSIDE the core — the density skeleton crawl
    curation uses to find the tightly-linked center of the web graph (spam
    farms and orphan hosts peel off in the first rounds).

    Peeling is a FIXED number of rounds on both engines (the DuckDB twin
    unrolls them as chained CTEs, exactly like pagerank's power iterations);
    ``rounds`` bounds the peel depth the same way max_dist bounds the BFS
    distance transform — once a round deletes nothing the remaining rounds
    are no-ops, so any rounds ≥ the true peel depth gives the exact k-core.
    Each round is one groupBy(degree) + one semi-join of the edge list
    against the survivor set — edge-list-linear, no collect."""
    und = (
        links.where(F.col("src_host") != F.col("dst_host"))
        .select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = und
    for _ in range(rounds):
        deg = (
            edges.select(F.col("a").alias("host"))
            .unionByName(edges.select(F.col("b").alias("host")))
            .groupBy("host")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("host")
        edges = (
            edges.join(keep.withColumnRenamed("host", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("host", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        if edges.isEmpty():
            break
    final = (
        edges.select(F.col("a").alias("host"))
        .unionByName(edges.select(F.col("b").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    return final.where(F.col("deg") >= k)


def kcore_sql(links_sql: str, k: int = 2, rounds: int = 8) -> str:
    """DuckDB twin of :func:`kcore`: the same fixed peel rounds as chained
    CTEs."""
    ctes = [
        f"""e0 AS MATERIALIZED (
  SELECT DISTINCT least(src_host, dst_host) AS a, greatest(src_host, dst_host) AS b
  FROM ({links_sql}) WHERE src_host <> dst_host)"""
    ]
    for r in range(1, rounds + 1):
        p = f"e{r - 1}"
        ctes.append(
            f"""k{r} AS MATERIALIZED (
  SELECT host FROM (
    SELECT host, count(*) AS deg FROM (
      SELECT a AS host FROM {p} UNION ALL SELECT b AS host FROM {p}) GROUP BY host)
  WHERE deg >= {k})"""
        )
        ctes.append(
            f"""e{r} AS MATERIALIZED (
  SELECT a, b FROM {p}
  WHERE a IN (SELECT host FROM k{r}) AND b IN (SELECT host FROM k{r}))"""
        )
    return f"""
WITH {', '.join(ctes)}
SELECT host, CAST(count(*) AS BIGINT) AS deg FROM (
  SELECT a AS host FROM e{rounds} UNION ALL SELECT b AS host FROM e{rounds})
GROUP BY host HAVING count(*) >= {k}
"""


def host_distances(links: DataFrame, rounds: int = 6) -> DataFrame:
    """(host, dist): single-source weighted shortest paths over the host
    link graph — Bellman-Ford with ``rounds`` relaxation rounds (paths up to
    ``rounds`` hops), source = the lexicographically smallest host, edge
    cost = 1 / n_links (heavily-linked hops are cheap, the standard
    link-strength-to-distance transform). Unreached hosts are absent.

    Exact-twin note: every candidate distance is a sum of identically-ordered
    IEEE additions along one path, and each round takes min() over the same
    candidate SET in both engines — min is order-insensitive, so the result
    is bit-identical without decimal detours.

    Scale shape: the frontier table is host-cardinality metadata; each round
    is one equi-join frontier⋈edges + one map-side-combinable min-groupBy —
    the same bounded-rounds discipline as pagerank/kcore (no driver loop
    over data, no unbounded recursion)."""
    edges = links.select(
        "src_host",
        "dst_host",
        (F.lit(1.0) / F.col("n_links").cast("double")).alias("w"),
    )
    hosts = (
        links.select(F.col("src_host").alias("host"))
        .unionByName(links.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    # edges and the frontier are each referenced twice per round — checkpoint
    # both so the logical plan stays O(1) per round instead of doubling
    # (2^rounds leaf scans otherwise; same lineage-explosion class as the
    # update_tree fix). Both tables are host-cardinality metadata.
    edges = edges.localCheckpoint(eager=False)
    d = hosts.agg(F.min("host").alias("host")).select("host", F.lit(0.0).alias("dist"))
    for _ in range(rounds):
        d = d.localCheckpoint(eager=False)
        relaxed = d.join(edges, d["host"] == edges["src_host"]).select(
            F.col("dst_host").alias("host"), (F.col("dist") + F.col("w")).alias("cand")
        )
        d = (
            d.select("host", F.col("dist").alias("cand"))
            .unionByName(relaxed)
            .groupBy("host")
            .agg(F.min("cand").alias("dist"))
        )
    return d


def host_distances_sql(links_sql: str, rounds: int = 6) -> str:
    """DuckDB twin of :func:`host_distances`. ``links_sql`` yields
    (src_host, dst_host, n_links)."""
    ctes = [
        f"lnk AS ({links_sql})",
        "edges AS (SELECT src_host, dst_host, 1.0 / CAST(n_links AS DOUBLE) AS w FROM lnk)",
        """hosts AS (SELECT DISTINCT host FROM (
           SELECT src_host AS host FROM lnk
           UNION ALL SELECT dst_host AS host FROM lnk))""",
        "d0 AS (SELECT min(host) AS host, 0.0 AS dist FROM hosts)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""d{i} AS (
  SELECT host, min(cand) AS dist FROM (
    SELECT host, dist AS cand FROM d{i - 1}
    UNION ALL
    SELECT e.dst_host AS host, d.dist + e.w AS cand
    FROM d{i - 1} d JOIN edges e ON d.host = e.src_host)
  GROUP BY host)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT host, dist FROM d{rounds}"


def host_communities(links: DataFrame, rounds: int = 4) -> DataFrame:
    """(host, community): synchronous label propagation over the host link
    graph — every round each host adopts the heaviest label among its
    neighbors (edge weight n_links, both directions), ties to the smallest
    label; isolated hosts keep their own. The crawl-cluster signal
    (site families / mirror groups) one step softer than connected
    components (dedup_clusters) because weights matter.

    Synchronous LPA oscillates on symmetric structures (two nodes endlessly
    swapping labels), so each node also casts a SELF-VOTE: its current label
    weighted by its strongest incident edge — a node only changes label when
    some neighbor label strictly outweighs its strongest tie, ties resolved
    to the smallest label. Deterministic by construction, so the unrolled
    DuckDB twin is exact. Scale shape: labels and edges are host-cardinality
    metadata; each round is one join + one (host, label) groupBy + one
    per-host argmax window; per-round localCheckpoint keeps the plan O(1)
    like host_distances."""
    from pyspark.sql import Window

    und = (
        links.select("src_host", "dst_host", "n_links")
        .unionByName(
            links.select(
                F.col("dst_host").alias("src_host"),
                F.col("src_host").alias("dst_host"),
                "n_links",
            )
        )
        .groupBy("src_host", "dst_host")
        .agg(F.sum("n_links").alias("w"))
        .localCheckpoint(eager=False)
    )
    selfw = und.groupBy("src_host").agg(F.max("w").alias("w_self")).localCheckpoint(eager=False)
    lab = selfw.select(F.col("src_host").alias("host"), F.col("src_host").alias("community"))
    rk = Window.partitionBy("host").orderBy(F.desc("w_sum"), "community")
    for _ in range(rounds):
        lab = lab.localCheckpoint(eager=False)
        nvotes = (
            und.join(lab, und["dst_host"] == lab["host"])
            .select(F.col("src_host").alias("host"), "community", "w")
        )
        svotes = lab.join(selfw, lab["host"] == selfw["src_host"]).select(
            "host", "community", F.col("w_self").alias("w")
        )
        votes = (
            nvotes.unionByName(svotes)
            .groupBy("host", "community")
            .agg(F.sum("w").alias("w_sum"))
        )
        lab = (
            votes.withColumn("rn", F.row_number().over(rk))
            .where(F.col("rn") == 1)
            .select("host", "community")
        )
    return lab


def host_communities_sql(links_sql: str, rounds: int = 4) -> str:
    """DuckDB twin of :func:`host_communities`."""
    ctes = [
        f"lnk AS ({links_sql})",
        """und AS (
  SELECT src_host, dst_host, CAST(sum(n_links) AS BIGINT) AS w FROM (
    SELECT src_host, dst_host, n_links FROM lnk
    UNION ALL SELECT dst_host AS src_host, src_host AS dst_host, n_links FROM lnk)
  GROUP BY src_host, dst_host)""",
        "selfw AS (SELECT src_host, CAST(max(w) AS BIGINT) AS w_self FROM und GROUP BY src_host)",
        "l0 AS (SELECT src_host AS host, src_host AS community FROM selfw)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""l{i} AS (
  SELECT host, community FROM (
    SELECT host, community,
           row_number() OVER (PARTITION BY host ORDER BY w_sum DESC, community) AS rn
    FROM (
      SELECT host, community, CAST(sum(w) AS BIGINT) AS w_sum FROM (
        SELECT u.src_host AS host, p.community, u.w
        FROM und u JOIN l{i - 1} p ON u.dst_host = p.host
        UNION ALL
        SELECT l.host, l.community, s.w_self AS w
        FROM l{i - 1} l JOIN selfw s ON l.host = s.src_host)
      GROUP BY host, community))
  WHERE rn = 1)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT host, community FROM l{rounds}"


# ---------------------------------------------------------------- HITS

def hits(links: DataFrame, iterations: int = 5) -> DataFrame:
    """(host, hub, auth): Kleinberg's HITS over the real extracted link
    graph (curation.extract_links: src_host, dst_host, n_links), K power
    rounds with L1 normalization.

        auth⁰ = hub⁰ = 1/N
        authᵏ ∝ Σ_in  w · hubᵏ⁻¹(src);   hubᵏ ∝ Σ_out w · authᵏ(dst)

    (each re-normalized to sum 1 — the L1 variant keeps the twin exact:
    cross-row sums in DECIMAL(28,15), the normalizing division a single
    IEEE double op per row, no sqrt ordering concerns).

    Scale shape: identical to :func:`pagerank` — the edge list is
    host-cardinality metadata; every half-round is edges ⋈ scores
    (broadcast, |hosts| rows) then ONE map-side-combined groupBy; scores
    are localCheckpointed per round so round k's broadcast doesn't
    re-evaluate rounds 1..k−1. Hosts with no in-links (pure hubs) and no
    out-links (pure authorities / dangling crawl targets) stay in the
    score vectors with 0 via the left join + coalesce.

    Reference role: none (the reference has no graph surface); this is the
    second classic link-analysis prior beside PageRank for crawl-frontier
    and quality weighting (SURVEY.md §2.1).
    """
    dec = "decimal(28,15)"
    hosts = (
        links.select(F.col("src_host").alias("host"))
        .unionByName(links.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    w = Window.orderBy("host")
    nodes = hosts.select(
        "host", (F.row_number().over(w) - 1).cast("long").alias("host_id")
    ).localCheckpoint(eager=True)
    sid = nodes.select(F.col("host").alias("src_host"), F.col("host_id").alias("src"))
    did = nodes.select(F.col("host").alias("dst_host"), F.col("host_id").alias("dst"))
    edges = (
        links.join(F.broadcast(sid), "src_host")
        .join(F.broadcast(did), "dst_host")
        .select("src", "dst", F.col("n_links").cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    n_hosts = nodes.agg(F.count("*").alias("n_hosts"))
    scores = (
        nodes.select("host_id")
        .crossJoin(F.broadcast(n_hosts))
        .select(
            "host_id",
            (F.lit(1.0) / F.col("n_hosts").cast("double")).alias("hub"),
            (F.lit(1.0) / F.col("n_hosts").cast("double")).alias("auth"),
        )
        .localCheckpoint(eager=True)
    )

    def _half(src_scores: DataFrame, score_col: str, join_key: str, group_key: str, out: str) -> DataFrame:
        """One HITS half-round: sum w·score over ``join_key`` grouped by
        ``group_key``, L1-normalized. Returns (host_id, <out>)."""
        raw = (
            edges.join(
                F.broadcast(src_scores.select(F.col("host_id").alias(join_key), score_col)),
                join_key,
            )
            .select(
                F.col(group_key).alias("host_id"),
                (F.col("w").cast("double") * F.col(score_col)).alias("c"),
            )
            .groupBy("host_id")
            .agg(F.sum(F.col("c").cast(dec)).alias("s_dec"))
        )
        tot = raw.agg(F.sum("s_dec").alias("tot"))
        return (
            nodes.select("host_id")
            .join(raw, "host_id", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "host_id",
                F.coalesce(
                    F.col("s_dec").cast("double") / F.col("tot").cast("double"), F.lit(0.0)
                ).alias(out),
            )
        )

    for _ in range(iterations):
        auth = _half(scores, "hub", "src", "dst", "auth")
        hub = _half(auth.withColumnRenamed("auth", "auth"), "auth", "dst", "src", "hub")
        scores = auth.join(hub, "host_id").select("host_id", "hub", "auth").localCheckpoint(
            eager=True
        )
    return nodes.join(scores, "host_id").select("host", "hub", "auth")


def hits_sql(links_sql: str, iterations: int = 5) -> str:
    """DuckDB twin of :func:`hits`. ``links_sql`` must yield
    (src_host, dst_host, n_links)."""
    dec = "DECIMAL(28,15)"
    ctes = [
        f"links AS MATERIALIZED ({links_sql})",
        """hosts AS (SELECT DISTINCT host FROM (
           SELECT src_host AS host FROM links
           UNION ALL SELECT dst_host AS host FROM links))""",
        """nid AS MATERIALIZED (SELECT host,
             CAST(row_number() OVER (ORDER BY host) - 1 AS BIGINT) AS host_id
           FROM hosts)""",
        "c AS (SELECT CAST(count(*) AS BIGINT) AS n_hosts FROM nid)",
        """edges AS MATERIALIZED (SELECT s.host_id AS src, d.host_id AS dst,
             CAST(l.n_links AS BIGINT) AS w
           FROM links l
           JOIN nid s ON l.src_host = s.host
           JOIN nid d ON l.dst_host = d.host)""",
        """s0 AS (SELECT host_id,
             (1.0 / CAST((SELECT n_hosts FROM c) AS DOUBLE)) AS hub,
             (1.0 / CAST((SELECT n_hosts FROM c) AS DOUBLE)) AS auth
           FROM nid)""",
    ]

    # Each normalize CTE references its _raw CTE twice (numerator + L1-sum
    # scalar subquery) and each half-round feeds the next: without
    # MATERIALIZED DuckDB inlines the chain and the plan grows 4^iterations.
    def half(k: int, prev: str, score: str, join_key: str, group_key: str, out: str) -> str:
        return f"""{out}{k} AS MATERIALIZED (
  SELECT n.host_id,
         coalesce(CAST(r.s_dec AS DOUBLE) / CAST((SELECT sum(s_dec) FROM {out}{k}_raw) AS DOUBLE), 0.0) AS {out}
  FROM nid n LEFT JOIN {out}{k}_raw r ON n.host_id = r.host_id)""", f"""{out}{k}_raw AS MATERIALIZED (
  SELECT e.{group_key} AS host_id,
         sum(CAST((CAST(e.w AS DOUBLE) * p.{score}) AS {dec})) AS s_dec
  FROM edges e JOIN {prev} p ON e.{join_key} = p.host_id GROUP BY e.{group_key})"""

    prev = "s0"
    for k in range(1, iterations + 1):
        a_main, a_raw = half(k, prev, "hub", "src", "dst", "auth")
        ctes += [a_raw, a_main]
        h_main, h_raw = half(k, f"auth{k}", "auth", "dst", "src", "hub")
        ctes += [h_raw, h_main]
        ctes.append(
            f"s{k} AS (SELECT a.host_id, h.hub, a.auth FROM auth{k} a JOIN hub{k} h ON a.host_id = h.host_id)"
        )
        prev = f"s{k}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT n.host, s.hub, s.auth FROM nid n JOIN {prev} s ON n.host_id = s.host_id"
    )


# ---------------------------------------------------- personalized PageRank

def link_ppr(
    links: DataFrame, seed_prefix: str = "a", iterations: int = 5
) -> DataFrame:
    """(host, is_seed, rank): personalized PageRank over the real extracted
    link graph — teleportation jumps only to the SEED set (hosts whose name
    starts with ``seed_prefix``), so rank measures proximity to the seeds:

        rank⁰ = 1/|S|·[h∈S]
        rankᵏ = (1−d)/|S|·[h∈S] + d · Σ_in w·rankᵏ⁻¹(src)/out_deg(src)

    This is the crawl-frontier prioritizer ("expand outward from trusted
    seeds" — the TrustRank shape) and the random-walk-with-restart kernel
    personalization/recommendation stacks use. Dangling mass leaks, same as
    :func:`link_pagerank`.

    Scale shape identical to :func:`pagerank`: host-cardinality edges, one
    broadcast join + one map-side-combined DECIMAL groupBy per round, scores
    localCheckpointed so round k doesn't re-evaluate rounds 1..k−1."""
    dec = "decimal(28,15)"
    hosts = (
        links.select(F.col("src_host").alias("host"))
        .unionByName(links.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    out = links.groupBy(F.col("src_host").alias("host")).agg(
        F.sum("n_links").alias("deg")
    )
    w = Window.orderBy("host")
    nodes = (
        hosts.join(out, "host", "left")
        .select("host", F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("out_deg"))
        .withColumn("host_id", (F.row_number().over(w) - 1).cast("long"))
        .withColumn("is_seed", F.col("host").startswith(seed_prefix))
        .localCheckpoint(eager=True)
    )
    n_seeds = nodes.where("is_seed").agg(F.count("*").alias("n_seeds"))
    sid = nodes.select(F.col("host").alias("src_host"), F.col("host_id").alias("src"), "out_deg")
    did = nodes.select(F.col("host").alias("dst_host"), F.col("host_id").alias("dst"))
    edges = (
        links.join(F.broadcast(sid), "src_host")
        .join(F.broadcast(did), "dst_host")
        .select("src", "dst", F.col("n_links").cast("long").alias("w"), "out_deg")
        .localCheckpoint(eager=True)
    )
    base = (
        nodes.select("host_id", "is_seed")
        .crossJoin(F.broadcast(n_seeds))
        .select(
            "host_id",
            F.when(
                F.col("is_seed"),
                F.lit(BASE_NUM) / F.col("n_seeds").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("base"),
            F.when(
                F.col("is_seed"), F.lit(1.0) / F.col("n_seeds").cast("double")
            )
            .otherwise(F.lit(0.0))
            .alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    ranks = base.select("host_id", "rank")
    for _ in range(iterations):
        contrib = (
            edges.join(F.broadcast(ranks.withColumnRenamed("host_id", "src")), "src")
            .select(
                "dst",
                (
                    F.col("w").cast("double")
                    * (F.col("rank") / F.col("out_deg").cast("double"))
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum(F.col("c").cast(dec)).cast("double").alias("s"))
        )
        ranks = (
            base.select("host_id", "base")
            .join(contrib.withColumnRenamed("dst", "host_id"), "host_id", "left")
            .select(
                "host_id",
                (
                    F.col("base")
                    + F.lit(DAMPING) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return nodes.join(ranks, "host_id").select("host", "is_seed", "rank")


def link_ppr_sql(links_sql: str, seed_prefix: str = "a", iterations: int = 5) -> str:
    """DuckDB twin of :func:`link_ppr`."""
    dec = "DECIMAL(28,15)"
    ctes = [
        f"links AS MATERIALIZED ({links_sql})",
        """hosts AS (SELECT DISTINCT host FROM (
           SELECT src_host AS host FROM links
           UNION ALL SELECT dst_host AS host FROM links))""",
        """odeg AS (SELECT src_host AS host, CAST(sum(n_links) AS BIGINT) AS deg
           FROM links GROUP BY src_host)""",
        f"""nid AS MATERIALIZED (SELECT h.host, coalesce(o.deg, 0) AS out_deg,
             CAST(row_number() OVER (ORDER BY h.host) - 1 AS BIGINT) AS host_id,
             (h.host LIKE '{seed_prefix}%') AS is_seed
           FROM hosts h LEFT JOIN odeg o ON h.host = o.host)""",
        "c AS (SELECT CAST(count(*) AS BIGINT) AS n_seeds FROM nid WHERE is_seed)",
        """edges AS MATERIALIZED (SELECT s.host_id AS src, d.host_id AS dst,
             CAST(l.n_links AS BIGINT) AS w, s.out_deg
           FROM links l
           JOIN nid s ON l.src_host = s.host
           JOIN nid d ON l.dst_host = d.host)""",
        """r0 AS (SELECT host_id,
             CASE WHEN is_seed
                  THEN (1.0 / CAST((SELECT n_seeds FROM c) AS DOUBLE))
                  ELSE 0.0 END AS rank
           FROM nid)""",
    ]
    base = (
        f"(CASE WHEN nid.is_seed THEN ({BASE_NUM!r} / CAST((SELECT n_seeds FROM c) AS DOUBLE)) "
        f"ELSE 0.0 END)"
    )
    for k in range(1, iterations + 1):
        ctes.append(
            f"""r{k} AS MATERIALIZED (
  SELECT nid.host_id,
         ({base} + {DAMPING!r} * coalesce(s.sc, 0.0)) AS rank
  FROM nid LEFT JOIN (
    SELECT e.dst AS host_id,
           CAST(sum(CAST((CAST(e.w AS DOUBLE) * (r.rank / CAST(e.out_deg AS DOUBLE))) AS {dec})) AS DOUBLE) AS sc
    FROM edges e JOIN r{k - 1} r ON e.src = r.host_id GROUP BY e.dst) s
  ON nid.host_id = s.host_id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT n.host, n.is_seed, r.rank FROM nid n JOIN r{iterations} r ON n.host_id = r.host_id"
    )


def graph_structure(links: DataFrame) -> DataFrame:
    """ONE row (n_nodes, n_edges, n_recip, reciprocity, assortativity):
    structural summary of the directed host graph —

    - reciprocity: fraction of directed edges whose reverse also exists
      (mutual linking; high = communities, low = hierarchy/spam farms),
    - degree assortativity (Newman 2002): Pearson correlation of
      (out-degree(src), in-degree(dst)) across edges; positive = hubs link
      hubs, negative (typical of the web) = hubs link the periphery.

    links: (src_host, dst_host). Scale shape: degrees from two edge-list
    groupBys (host-cardinality); reciprocity via one self-join on the
    reversed key; the correlation from five DECIMAL moment sums over the
    edge list — no windows, no iteration."""
    e = links.select("src_host", "dst_host").where(
        F.col("src_host") != F.col("dst_host")
    ).distinct().localCheckpoint(eager=False)
    outd = e.groupBy("src_host").agg(F.count("*").cast("long").alias("od"))
    ind = e.groupBy("dst_host").agg(F.count("*").cast("long").alias("idg"))
    rev = e.select(
        F.col("src_host").alias("dst_host"), F.col("dst_host").alias("src_host")
    )
    recip = e.join(rev, ["src_host", "dst_host"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_recip")
    )
    nodes = (
        e.select(F.col("src_host").alias("h"))
        .unionByName(e.select(F.col("dst_host").alias("h")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    dec = "decimal(28,6)"
    j = (
        e.join(outd, "src_host")
        .join(ind, "dst_host")
        .select(F.col("od").cast("double").alias("xv"), F.col("idg").cast("double").alias("yv"))
    )
    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.col("xv").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("yv").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("xv") * F.col("yv")).cast(dec)).cast("double").alias("sxy"),
        F.sum((F.col("xv") * F.col("xv")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("yv") * F.col("yv")).cast(dec)).cast("double").alias("syy"),
    )
    n = F.col("n_edges").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (
        m.crossJoin(F.broadcast(recip))
        .crossJoin(F.broadcast(nodes))
        .select(
            "n_nodes",
            "n_edges",
            "n_recip",
            F.round(
                F.col("n_recip").cast("double") / F.col("n_edges").cast("double"), 6
            ).alias("reciprocity"),
            F.round(
                F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6
            ).alias("assortativity"),
        )
    )


def graph_structure_sql(links_sql: str) -> str:
    """DuckDB twin of :func:`graph_structure`."""
    return f"""
WITH e AS (
  SELECT DISTINCT src_host, dst_host FROM ({links_sql})
  WHERE src_host <> dst_host),
outd AS (SELECT src_host, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY 1),
ind AS (SELECT dst_host, CAST(count(*) AS BIGINT) AS idg FROM e GROUP BY 1),
recip AS (
  SELECT CAST(count(*) AS BIGINT) AS n_recip
  FROM e WHERE EXISTS (
    SELECT 1 FROM e r WHERE r.src_host = e.dst_host AND r.dst_host = e.src_host)),
nodes AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM (
    SELECT src_host AS h FROM e UNION SELECT dst_host FROM e)),
j AS (
  SELECT CAST(o.od AS DOUBLE) AS xv, CAST(i.idg AS DOUBLE) AS yv
  FROM e JOIN outd o ON e.src_host = o.src_host
  JOIN ind i ON e.dst_host = i.dst_host),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges,
         CAST(sum(CAST(xv AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(yv AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(xv * yv AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(xv * xv AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(yv * yv AS DECIMAL(28,6))) AS DOUBLE) AS syy
  FROM j)
SELECT n_nodes, n_edges, n_recip,
       round(CAST(n_recip AS DOUBLE) / CAST(n_edges AS DOUBLE), 6) AS reciprocity,
       round(CASE WHEN sqrt((CAST(n_edges AS DOUBLE) * sxx - sx * sx)
                            * (CAST(n_edges AS DOUBLE) * syy - sy * sy)) > 0
                  THEN (CAST(n_edges AS DOUBLE) * sxy - sx * sy)
                       / sqrt((CAST(n_edges AS DOUBLE) * sxx - sx * sx)
                              * (CAST(n_edges AS DOUBLE) * syy - sy * sy))
                  ELSE 0.0 END, 6) AS assortativity
FROM m, recip, nodes
"""


def betweenness(links: DataFrame, k_sources: int = 4, max_depth: int = 5) -> DataFrame:
    """(host, bc): k-source Brandes betweenness centrality over the
    undirected host graph — exact dependency accumulation from the
    ``k_sources`` lexicographically-smallest hosts (the deterministic
    pivot-sampling variant; bc is the Brandes partial sum over those
    sources, halved for undirectedness).

    Two bounded-round passes, all host-cardinality metadata:
    - forward: multi-source BFS carried as ONE table keyed (src, host) —
      per round, frontier⋈edges, anti-join against settled, σ summed per
      (src, host) (integer path counts, exact);
    - backward: for depth d = D..1, δ(u) += Σ_{w ∈ succ(u)}
      (σu/σw)(1+δw), DECIMAL-summed so cross-engine addition order cannot
      matter.

    No per-source loop: the source id is a column, so k sources cost one
    extra key in the same joins — the vectorized-multi-source trick that
    makes sampled betweenness tractable on one pass structure."""
    und = (
        links.select(F.col("src_host").alias("a"), F.col("dst_host").alias("b"))
        .unionByName(
            links.select(F.col("dst_host").alias("a"), F.col("src_host").alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hosts = und.select(F.col("a").alias("host")).distinct()
    sources = hosts.orderBy("host").limit(k_sources).select(F.col("host").alias("src"))
    state = (
        sources.select(
            "src",
            F.col("src").alias("host"),
            F.lit(0).cast("long").alias("dist"),
            F.lit(1).cast("long").alias("sigma"),
        )
        .localCheckpoint(eager=True)
    )
    settled = state
    frontier = state
    for d in range(1, max_depth + 1):
        cand = (
            frontier.join(und, frontier["host"] == und["a"])
            .select("src", F.col("b").alias("host"), "sigma")
            .join(settled.select("src", "host"), ["src", "host"], "left_anti")
        )
        nxt = (
            cand.groupBy("src", "host")
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .withColumn("dist", F.lit(d).cast("long"))
            .select("src", "host", "dist", "sigma")
            .localCheckpoint(eager=True)
        )
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    delta = settled.select("src", "host", "dist", "sigma", F.lit(0.0).alias("delta"))
    DEC = "decimal(28,15)"
    for d in range(max_depth, 0, -1):
        wd = delta.where(F.col("dist") == d).select(
            "src",
            F.col("host").alias("w_host"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        u_side = delta.where(F.col("dist") == d - 1).select(
            F.col("src").alias("u_src"),
            F.col("host").alias("u_host"),
            F.col("sigma").alias("sigma_u"),
        )
        contrib = (
            u_side.join(und, F.col("u_host") == und["a"])
            .join(
                wd,
                (F.col("b") == wd["w_host"])
                & (F.col("u_src") == wd["src"]),
            )
            .select(
                F.col("u_src").alias("src"),
                F.col("u_host").alias("host"),
                (
                    (F.col("sigma_u").cast("double") / F.col("sigma_w").cast("double"))
                    * (F.lit(1.0) + F.col("delta_w"))
                ).alias("term"),
            )
            .groupBy("src", "host")
            .agg(F.sum(F.col("term").cast(DEC)).cast("double").alias("c"))
        )
        delta = (
            delta.join(contrib, ["src", "host"], "left")
            .withColumn("delta", F.col("delta") + F.coalesce(F.col("c"), F.lit(0.0)))
            .drop("c")
            .localCheckpoint(eager=True)
        )
    return (
        delta.where(F.col("host") != F.col("src"))
        .groupBy("host")
        .agg(
            F.round(
                F.sum(F.col("delta").cast(DEC)).cast("double") / F.lit(2.0), 6
            ).alias("bc")
        )
    )


def betweenness_sql(links_sql: str, k_sources: int = 4, max_depth: int = 5) -> str:
    """DuckDB twin of :func:`betweenness` — both passes textually unrolled."""
    ctes = [
        f"lnk AS ({links_sql})",
        """und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src_host AS a, dst_host AS b FROM lnk
    UNION ALL SELECT dst_host AS a, src_host AS b FROM lnk)
  WHERE a <> b)""",
        f"""srcs AS (
  SELECT host AS src FROM (SELECT DISTINCT a AS host FROM und)
  ORDER BY host LIMIT {k_sources})""",
        "s0 AS (SELECT src, src AS host, CAST(0 AS BIGINT) AS dist, CAST(1 AS BIGINT) AS sigma FROM srcs)",
        "settled0 AS (SELECT * FROM s0)",
    ]
    for d in range(1, max_depth + 1):
        ctes.append(f"""s{d} AS MATERIALIZED (
  SELECT src, host, CAST({d} AS BIGINT) AS dist, CAST(sum(sigma) AS BIGINT) AS sigma
  FROM (
    SELECT f.src, e.b AS host, f.sigma
    FROM s{d-1} f JOIN und e ON f.host = e.a) c
  WHERE NOT EXISTS (SELECT 1 FROM settled{d-1} s
                    WHERE s.src = c.src AND s.host = c.host)
  GROUP BY src, host)""")
        ctes.append(
            f"settled{d} AS MATERIALIZED (SELECT * FROM settled{d-1} UNION ALL SELECT * FROM s{d})"
        )
    ctes.append(
        f"b{max_depth + 1} AS (SELECT src, host, dist, sigma, 0.0 AS delta FROM settled{max_depth})"
    )
    for d in range(max_depth, 0, -1):
        ctes.append(f"""b{d} AS MATERIALIZED (
  SELECT p.src, p.host, p.dist, p.sigma,
         p.delta + COALESCE(c.c, 0.0) AS delta
  FROM b{d+1} p LEFT JOIN (
    SELECT u.src, u.host,
           CAST(sum(CAST((CAST(u.sigma AS DOUBLE) / CAST(w.sigma AS DOUBLE))
                         * (1.0 + w.delta) AS DECIMAL(28,15))) AS DOUBLE) AS c
    FROM b{d+1} u
    JOIN und e ON u.host = e.a
    JOIN b{d+1} w ON w.src = u.src AND w.host = e.b AND w.dist = {d}
    WHERE u.dist = {d-1}
    GROUP BY u.src, u.host) c
  ON c.src = p.src AND c.host = p.host)""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT host,
       round(CAST(sum(CAST(delta AS DECIMAL(28,15))) AS DOUBLE) / 2.0, 6) AS bc
FROM b1 WHERE host <> src GROUP BY host"""
    )


def robustness_curve(
    links: DataFrame, ks: tuple[int, ...] = (0, 2, 8), rounds: int = 6
) -> DataFrame:
    """(k_removed, n_hosts, giant, frac): targeted-attack robustness of the
    host graph — for each k in ``ks``, remove the k highest-degree hosts
    (ties by name) and measure the giant connected component of what
    remains via ``rounds`` min-label-propagation rounds. The
    scale-free-network fragility curve (Albert/Jeong/Barabási): a steep
    drop at small k means a few hub hosts hold the crawl graph together.

    Vectorized over k exactly like betweenness over sources: k is a COLUMN,
    so all curve points share one bounded-round pass (edge fan-out = |E|·|ks|,
    all host metadata); no per-k driver loop."""
    und = (
        links.select(F.col("src_host").alias("a"), F.col("dst_host").alias("b"))
        .unionByName(
            links.select(F.col("dst_host").alias("a"), F.col("src_host").alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hosts = und.select(F.col("a").alias("host")).distinct()
    deg = und.groupBy(F.col("a").alias("host")).agg(F.count(F.lit(1)).alias("deg"))
    kmax = max(ks)
    # distributed top-kmax, then rank the ≤ kmax rows
    top = deg.orderBy(F.desc("deg"), "host").limit(kmax)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("deg"), "host")
    ranked = top.withColumn("rnk", F.row_number().over(w)).select("host", "rnk")
    ks_df = links.sparkSession.createDataFrame([(int(k),) for k in ks], "k long")
    removed = ks_df.join(
        F.broadcast(ranked), F.col("rnk") <= F.col("k")
    ).select("k", "host").localCheckpoint(eager=True)
    alive = (
        ks_df.crossJoin(hosts)
        .join(removed, ["k", "host"], "left_anti")
        .localCheckpoint(eager=True)
    )
    edges_k = (
        ks_df.crossJoin(und)
        .join(removed.withColumnRenamed("host", "a"), ["k", "a"], "left_anti")
        .join(removed.withColumnRenamed("host", "b"), ["k", "b"], "left_anti")
        .localCheckpoint(eager=True)
    )
    label = alive.select("k", "host", F.col("host").alias("lbl"))
    ek = edges_k.select(
        F.col("k").alias("ek_k"), F.col("a").alias("ek_a"), F.col("b").alias("ek_b")
    )
    for _ in range(rounds):
        nbr_min = (
            label.join(
                ek,
                (F.col("k") == F.col("ek_k")) & (F.col("host") == F.col("ek_a")),
            )
            .select(F.col("ek_k").alias("k"), F.col("ek_b").alias("host"), "lbl")
            .groupBy("k", "host")
            .agg(F.min("lbl").alias("nlbl"))
        )
        label = (
            label.join(nbr_min, ["k", "host"], "left")
            .select(
                "k",
                "host",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
    comp = label.groupBy("k", "lbl").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    n_alive = alive.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_hosts"))
    giant = comp.groupBy("k").agg(F.max("sz").cast("long").alias("giant"))
    return (
        n_alive.join(giant, "k")
        .select(
            F.col("k").alias("k_removed"),
            "n_hosts",
            "giant",
            F.round(F.col("giant").cast("double") / F.col("n_hosts").cast("double"), 6).alias(
                "frac"
            ),
        )
    )


def robustness_curve_sql(
    links_sql: str, ks: tuple[int, ...] = (0, 2, 8), rounds: int = 6
) -> str:
    """DuckDB twin of :func:`robustness_curve`."""
    kmax = max(ks)
    kvals = ", ".join(f"({int(k)})" for k in ks)
    ctes = [
        f"lnk AS ({links_sql})",
        """und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src_host AS a, dst_host AS b FROM lnk
    UNION ALL SELECT dst_host AS a, src_host AS b FROM lnk)
  WHERE a <> b)""",
        "hosts AS (SELECT DISTINCT a AS host FROM und)",
        "deg AS (SELECT a AS host, count(*) AS deg FROM und GROUP BY a)",
        f"""ranked AS (
  SELECT host, row_number() OVER (ORDER BY deg DESC, host) AS rnk
  FROM (SELECT host, deg FROM deg ORDER BY deg DESC, host LIMIT {kmax}))""",
        f"ks(k) AS (VALUES {kvals})",
        "removed AS (SELECT k, host FROM ks JOIN ranked ON rnk <= k)",
        """alive AS MATERIALIZED (
  SELECT k, host FROM ks CROSS JOIN hosts
  WHERE NOT EXISTS (SELECT 1 FROM removed r
                    WHERE r.k = ks.k AND r.host = hosts.host))""",
        """ek AS MATERIALIZED (
  SELECT ks.k, und.a, und.b FROM ks CROSS JOIN und
  WHERE NOT EXISTS (SELECT 1 FROM removed r WHERE r.k = ks.k AND r.host = und.a)
    AND NOT EXISTS (SELECT 1 FROM removed r WHERE r.k = ks.k AND r.host = und.b))""",
        "l0 AS (SELECT k, host, host AS lbl FROM alive)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(f"""l{i} AS MATERIALIZED (
  SELECT p.k, p.host,
         least(p.lbl, COALESCE(n.nlbl, p.lbl)) AS lbl
  FROM l{i-1} p LEFT JOIN (
    SELECT e.k, e.b AS host, min(u.lbl) AS nlbl
    FROM l{i-1} u JOIN ek e ON e.k = u.k AND e.a = u.host
    GROUP BY e.k, e.b) n
  ON n.k = p.k AND n.host = p.host)""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT a.k AS k_removed, a.n_hosts, g.giant,
       round(CAST(g.giant AS DOUBLE) / CAST(a.n_hosts AS DOUBLE), 6) AS frac
FROM (SELECT k, count(*)::BIGINT AS n_hosts FROM alive GROUP BY k) a
JOIN (SELECT k, CAST(max(sz) AS BIGINT) AS giant FROM
      (SELECT k, lbl, count(*)::BIGINT AS sz FROM l{rounds} GROUP BY k, lbl)
      GROUP BY k) g ON g.k = a.k"""
    )
