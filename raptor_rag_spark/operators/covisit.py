"""Item co-visitation similarity — the collaborative-filtering candidate
generator (item-item cosine over binarized user→item interactions), the
recommendation-side sibling of the dedup family's pair mining.

Input: the events table; the item is the ``k`` property of the event's JSON
props (both engines parse the same JSON path). The pipeline:

1. distinct (user, item) interactions — binarized implicit feedback;
2. per-user item self-join (i < j) → co-occurrence counts n_co;
3. cosine = n_co / sqrt(n_i · n_j) — sqrt and division are single
   correctly-rounded IEEE ops, so the DuckDB twin is hash-exact;
4. symmetric top-k neighbor lists per item.

Scale shape: the user self-join is the classic co-visitation skew bomb —
one crawler/bot account with 10⁵ distinct items contributes 10¹⁰ pairs.
``max_user_items`` drops power users BEFORE the join (the exact integer
guard the dedup family uses for hot shingles/bands); production covisit
pipelines (e.g. the OTTO/Merlin recipes) do the same. After the cap the
fan-out per user is ≤ cap², and the (i, j) groupBy has map-side combine.
Degrees join back by item (AQE picks broadcast vs shuffle on cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_USER_ITEMS = 200


def _interactions(events: DataFrame, max_user_items: int) -> DataFrame:
    ui = events.select(
        "user_id",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull()).distinct()
    heavy = (
        ui.groupBy("user_id")
        .agg(F.count("*").alias("n_items"))
        .where(F.col("n_items") > max_user_items)
        .select("user_id")
    )
    return ui.join(F.broadcast(heavy), "user_id", "left_anti")


def covisit_topk(
    events: DataFrame,
    top_k: int = 10,
    max_user_items: int = MAX_USER_ITEMS,
) -> DataFrame:
    """(item, neighbor, n_co, cosine, rank): symmetric top-k co-visitation
    neighbors per item, cosine over binarized interactions."""
    ui = _interactions(events, max_user_items)
    deg = ui.groupBy("item").agg(F.count("*").alias("n"))
    a = ui.select("user_id", F.col("item").alias("i"))
    b = ui.select("user_id", F.col("item").alias("j"))
    co = (
        a.join(b, "user_id")
        .where(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count("*").alias("n_co"))
    )
    scored = (
        co.join(deg.select(F.col("item").alias("i"), F.col("n").alias("n_i")), "i")
        .join(deg.select(F.col("item").alias("j"), F.col("n").alias("n_j")), "j")
        .withColumn(
            "cosine",
            F.col("n_co").cast("double")
            / F.sqrt(F.col("n_i").cast("double") * F.col("n_j").cast("double")),
        )
    )
    sym = scored.select(
        F.col("i").alias("item"), F.col("j").alias("neighbor"), "n_co", "cosine"
    ).unionByName(
        scored.select(
            F.col("j").alias("item"), F.col("i").alias("neighbor"), "n_co", "cosine"
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("cosine"), "neighbor")
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("item", "neighbor", F.col("n_co").cast("long").alias("n_co"), "cosine", "rank")
    )


def covisit_topk_sql(
    events_sql: str = "SELECT * FROM events",
    top_k: int = 10,
    max_user_items: int = MAX_USER_ITEMS,
) -> str:
    """DuckDB twin of :func:`covisit_topk`."""
    return f"""
WITH ui AS MATERIALIZED (
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM ({events_sql}) WHERE json_extract_string(props, '$.k') IS NOT NULL),
kept AS MATERIALIZED (
  SELECT * FROM ui WHERE user_id NOT IN (
    SELECT user_id FROM ui GROUP BY user_id HAVING count(*) > {max_user_items})),
deg AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM kept GROUP BY item),
co AS (
  SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS n_co
  FROM kept a JOIN kept b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY a.item, b.item),
scored AS (
  SELECT co.i, co.j, co.n_co,
         (CAST(co.n_co AS DOUBLE)
          / sqrt(CAST(di.n AS DOUBLE) * CAST(dj.n AS DOUBLE))) AS cosine
  FROM co JOIN deg di ON co.i = di.item JOIN deg dj ON co.j = dj.item),
sym AS (
  SELECT i AS item, j AS neighbor, n_co, cosine FROM scored
  UNION ALL
  SELECT j AS item, i AS neighbor, n_co, cosine FROM scored)
SELECT item, neighbor, n_co, cosine, rank FROM (
  SELECT item, neighbor, n_co, cosine,
         row_number() OVER (PARTITION BY item ORDER BY cosine DESC, neighbor) AS rank
  FROM sym) WHERE rank <= {top_k}
"""
