"""Space-time analytics: emerging-hotspot classification over a space-time
cube (cell × period event counts, Mann-Kendall trend per cell).

The classic GIS "emerging hot spot analysis" shape: bucket events into a
space-time cube (grid cell × time period), then score each cell's count
series with the Mann-Kendall S statistic and classify it as ``new``,
``intensifying``, ``diminishing`` or ``persistent``. The reference has no
temporal surface at all (its tree is built once from a static corpus); this
is the monitoring operator a continuously-crawled 100-TB corpus needs —
which regions of embedding space are heating up crawl over crawl.

Scale shape: ONE groupBy(cell, period) over the events (map-side combine),
after which everything runs on the cube — |cells| × |periods| rows, metadata
scale at any corpus size. The Mann-Kendall pair sum is a self-join of the
cube on cell (periods² per cell, bounded by the study window, never by data
volume). No UDF, no collect; every expression has a DuckDB twin so the
operator carries an exact oracle.

Mann-Kendall variant: no tie correction (VAR = n(n-1)(2n+5)/18), continuity
corrected z = (S - sign(S)) / sqrt(VAR) — the standard textbook form; both
engines evaluate the identical double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G

Z_HOT = 1.96  # two-sided 95%


def emerging_hotspots(
    events_xy: DataFrame,
    res: int,
    period_s: int = 86400,
    z_hot: float = Z_HOT,
) -> DataFrame:
    """events_xy: (x, y, ts) event points on the unit square.

    Returns one row per cell that ever saw an event:
    (cell_id, n_periods, total, s_stat, z, category).

    ``n_periods`` spans the GLOBAL study window (min..max period over the
    whole input) so silent periods count as zeros — a cell that burst in the
    last period scores ``new``, not ``persistent``.
    """
    pts = events_xy.select(
        G.cell_col(F.col("x"), F.col("y"), res).alias("cell_id"),
        F.floor(F.unix_timestamp("ts") / F.lit(period_s)).alias("period"),
    )
    # the only corpus-sized job: cube = cell × period counts
    cube = pts.groupBy("cell_id", "period").agg(
        F.count(F.lit(1)).alias("n")
    )

    # global study window (broadcast 1-row aggregate), zero-filled per cell
    window = cube.agg(
        F.min("period").alias("p0"), F.max("period").alias("p1")
    )
    grid = (
        cube.select("cell_id")
        .distinct()
        .crossJoin(F.broadcast(window))
        .select(
            "cell_id",
            F.explode(F.sequence(F.col("p0"), F.col("p1"))).alias("period"),
        )
    )
    filled = (
        grid.join(cube, ["cell_id", "period"], "left")
        .select("cell_id", "period", F.coalesce("n", F.lit(0)).alias("n"))
        .alias("a")
    )

    # Mann-Kendall pair sum: self-join on cell, earlier period vs later
    b = filled.alias("b")
    pairs = filled.join(
        b,
        (F.col("a.cell_id") == F.col("b.cell_id"))
        & (F.col("a.period") < F.col("b.period")),
    ).select(
        F.col("a.cell_id").alias("cell_id"),
        F.signum((F.col("b.n") - F.col("a.n")).cast("double")).alias("sgn"),
    )
    mk = pairs.groupBy("cell_id").agg(F.sum("sgn").cast("long").alias("s_stat"))

    totals = filled.groupBy("cell_id").agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_periods"),
        F.max(F.when(F.col("n") > 0, F.col("period"))).alias("last_active"),
        F.min(F.when(F.col("n") > 0, F.col("period"))).alias("first_active"),
        F.max("period").alias("p_end"),
    )

    np_ = F.col("n_periods").cast("double")
    var = np_ * (np_ - 1.0) * (2.0 * np_ + 5.0) / 18.0
    z = F.when(F.col("s_stat") != 0,
               (F.col("s_stat") - F.signum(F.col("s_stat").cast("double")))
               / F.sqrt(var)).otherwise(F.lit(0.0))

    out = totals.join(mk, "cell_id").withColumn("z", z)
    # ``new`` = first-ever activity in the final period; a one-period burst
    # can't reach Mann-Kendall significance, so recency, not z, defines it
    category = (
        F.when(F.col("first_active") == F.col("p_end"), F.lit("new"))
        .when(F.col("z") > z_hot, F.lit("intensifying"))
        .when(F.col("z") < -z_hot, F.lit("diminishing"))
        .otherwise(F.lit("persistent"))
    )
    return out.select(
        "cell_id",
        "n_periods",
        "total",
        "s_stat",
        F.round("z", 6).alias("z"),
        category.alias("category"),
    )


def emerging_hotspots_sql(
    events_xy_sql: str,
    res: int,
    period_s: int = 86400,
    z_hot: float = Z_HOT,
) -> str:
    """DuckDB twin of :func:`emerging_hotspots`; ``events_xy_sql`` must
    select (x, y, ts)."""
    cell = G.cell_sql("x", "y", res)
    return f"""
WITH ev AS (
  SELECT {cell} AS cell_id,
         CAST(floor(epoch(ts) / {period_s}) AS BIGINT) AS period
  FROM ({events_xy_sql})
),
cube AS (
  SELECT cell_id, period, CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
),
win AS (SELECT min(period) AS p0, max(period) AS p1 FROM cube),
grid AS (
  SELECT c.cell_id, p.period
  FROM (SELECT DISTINCT cell_id FROM cube) c,
       (SELECT unnest(range(p0, p1 + 1)) AS period FROM win) p
),
filled AS (
  SELECT g.cell_id, g.period, coalesce(c.n, 0) AS n
  FROM grid g LEFT JOIN cube c USING (cell_id, period)
),
mk AS (
  SELECT a.cell_id,
         CAST(sum(sign(CAST(b.n - a.n AS DOUBLE))) AS BIGINT) AS s_stat
  FROM filled a JOIN filled b
    ON a.cell_id = b.cell_id AND a.period < b.period
  GROUP BY 1
),
totals AS (
  SELECT cell_id,
         CAST(sum(n) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_periods,
         max(CASE WHEN n > 0 THEN period END) AS last_active,
         min(CASE WHEN n > 0 THEN period END) AS first_active,
         max(period) AS p_end
  FROM filled GROUP BY 1
),
scored AS (
  SELECT t.cell_id, t.n_periods, t.total, m.s_stat,
         t.first_active, t.p_end,
         CASE WHEN m.s_stat != 0 THEN
           (m.s_stat - sign(CAST(m.s_stat AS DOUBLE)))
           / sqrt(CAST(t.n_periods AS DOUBLE) * (CAST(t.n_periods AS DOUBLE) - 1.0)
                  * (2.0 * CAST(t.n_periods AS DOUBLE) + 5.0) / 18.0)
         ELSE 0.0 END AS z
  FROM totals t JOIN mk m USING (cell_id)
)
SELECT cell_id, n_periods, total, s_stat, round(z, 6) AS z,
       CASE WHEN first_active = p_end THEN 'new'
            WHEN z > {z_hot} THEN 'intensifying'
            WHEN z < -{z_hot} THEN 'diminishing'
            ELSE 'persistent' END AS category
FROM scored
"""


# ---------------------------------------------------------------- trajectories

DEC = "DECIMAL(28,15)"


def trajectory_stats(events_xy: DataFrame, id_col: str = "user_id") -> DataFrame:
    """Per-entity movement statistics over a timestamped point stream:
    (id, n_points, path_len, net_disp, straightness, mean_step).

    Input: (id_col, event_id, ts, x, y). Ordering inside a trajectory is
    (ts, event_id) — event_id breaks equal timestamps deterministically.
    ``path_len`` sums the segment lengths, ``net_disp`` is first→last,
    ``straightness`` = net/path ∈ [0,1] (1.0 for a single point or a
    perfectly straight run) — the loiter-vs-transit classifier of movement
    analytics, recast here over session activity in embedding space.

    Scale shape: ONE shuffle — the window partitionBy(id). Segment lengths
    are cast to DECIMAL(28,15) before summing so the per-trajectory total is
    order-independent and engine-exact (double accumulation order would
    differ); the struct-ordered min/max pick first/last points without a
    second sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("ts", "event_id")
    seg = F.sqrt(
        (F.col("x") - F.lag("x").over(w)) * (F.col("x") - F.lag("x").over(w))
        + (F.col("y") - F.lag("y").over(w)) * (F.col("y") - F.lag("y").over(w))
    )
    pt = F.struct("ts", "event_id", "x", "y")
    stepped = events_xy.select(
        id_col, "x", "y", pt.alias("pt"), seg.cast(DEC).alias("seg")
    )
    agg = stepped.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("seg").cast("double").alias("path_len"),
        F.min("pt").alias("p0"),
        F.max("pt").alias("p1"),
    )
    net = F.sqrt(
        (F.col("p1.x") - F.col("p0.x")) * (F.col("p1.x") - F.col("p0.x"))
        + (F.col("p1.y") - F.col("p0.y")) * (F.col("p1.y") - F.col("p0.y"))
    )
    path = F.coalesce(F.col("path_len"), F.lit(0.0))
    return agg.select(
        id_col,
        "n_points",
        F.round(path, 6).alias("path_len"),
        F.round(net, 6).alias("net_disp"),
        F.round(
            F.when(path > 0.0, net / path).otherwise(F.lit(1.0)), 6
        ).alias("straightness"),
        F.round(
            F.when(F.col("n_points") > 1, path / (F.col("n_points") - 1.0))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("mean_step"),
    )


def trajectory_stats_sql(events_xy_sql: str, id_col: str = "user_id") -> str:
    """DuckDB twin of :func:`trajectory_stats`."""
    return f"""
WITH ev AS ({events_xy_sql}),
stepped AS (
  SELECT {id_col}, x, y, ts, event_id,
         CAST(sqrt(
           (x - lag(x) OVER w) * (x - lag(x) OVER w)
           + (y - lag(y) OVER w) * (y - lag(y) OVER w)
         ) AS {DEC}) AS seg
  FROM ev
  WINDOW w AS (PARTITION BY {id_col} ORDER BY ts, event_id)
),
agg AS (
  SELECT {id_col},
         CAST(count(*) AS BIGINT) AS n_points,
         CAST(sum(seg) AS DOUBLE) AS path_len,
         min(struct_pack(ts := ts, event_id := event_id, x := x, y := y)) AS p0,
         max(struct_pack(ts := ts, event_id := event_id, x := x, y := y)) AS p1
  FROM stepped GROUP BY 1
),
scored AS (
  SELECT {id_col}, n_points,
         coalesce(path_len, 0.0) AS path,
         sqrt((p1.x - p0.x) * (p1.x - p0.x) + (p1.y - p0.y) * (p1.y - p0.y)) AS net
  FROM agg
)
SELECT {id_col}, n_points, round(path, 6) AS path_len, round(net, 6) AS net_disp,
       round(CASE WHEN path > 0.0 THEN net / path ELSE 1.0 END, 6) AS straightness,
       round(CASE WHEN n_points > 1 THEN path / (n_points - 1.0) ELSE 0.0 END, 6)
         AS mean_step
FROM scored
"""


def stay_points(
    events_xy: DataFrame, res: int = 6, min_events: int = 3, id_col: str = "user_id"
) -> DataFrame:
    """(user_id, cell_id, n_events, t_start, t_end): dwell detection — the
    maximal runs of CONSECUTIVE events (per user, time order) that stay in
    the same grid cell, kept when the run holds ≥ ``min_events`` events. The
    mobility-analytics "stay point": where an entity lingered, as opposed to
    where it passed through. Cell membership discretizes the radius test, so
    the whole detector is gaps-and-islands over window functions — no
    sequential scan kernel.

    Scale shape: one window partitioned by user (per-user time sort only;
    users are the natural shard) + one groupBy on the run id; both shuffles
    are on user_id. Timestamps are formatted to strings for the twin
    comparison per the house rule.
    """
    from pyspark.sql import Window

    cell = G.cell_col(F.col("x"), F.col("y"), res)
    w = Window.partitionBy(id_col).orderBy("ts", "event_id")
    runs = (
        events_xy.select(id_col, "event_id", "ts", cell.alias("cell_id"))
        .withColumn(
            "new_run",
            F.when(F.col("cell_id") == F.lag("cell_id").over(w), F.lit(0)).otherwise(F.lit(1)),
        )
        .withColumn("run_id", F.sum("new_run").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        runs.groupBy(id_col, "run_id")
        .agg(
            F.first("cell_id").alias("cell_id"),
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("t_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("t_end"),
        )
        .where(F.col("n_events") >= min_events)
        .select(id_col, "cell_id", "n_events", "t_start", "t_end")
    )


def stay_points_sql(
    events_xy_sql: str, res: int = 6, min_events: int = 3, id_col: str = "user_id"
) -> str:
    """DuckDB twin of :func:`stay_points`. ``events_xy_sql`` yields
    (user_id, event_id, ts, x, y)."""
    cell = G.cell_sql("x", "y", res)
    return f"""
WITH pts AS (SELECT {id_col}, event_id, ts, {cell} AS cell_id FROM ({events_xy_sql})),
flagged AS (
  SELECT {id_col}, event_id, ts, cell_id,
         CASE WHEN cell_id = lag(cell_id) OVER w THEN 0 ELSE 1 END AS new_run
  FROM pts WINDOW w AS (PARTITION BY {id_col} ORDER BY ts, event_id)),
runs AS (
  SELECT {id_col}, ts, cell_id,
         sum(new_run) OVER (PARTITION BY {id_col} ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged)
SELECT {id_col}, min(cell_id) AS cell_id, count(*)::BIGINT AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS t_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS t_end
FROM runs GROUP BY {id_col}, run_id
HAVING count(*) >= {min_events}
"""


def traj_resample(
    events_xy: DataFrame, n_samples: int = 8, id_col: str = "user_id"
) -> DataFrame:
    """(id, sample_idx, sx, sy): each trajectory resampled to ``n_samples``
    points at equal fractions of its cumulative arc length — the standard
    normalization before cross-trajectory comparison (Frechet/DTW inputs
    of equal length), and the polyline decimation a tile renderer applies
    before drawing long paths.

    Per trajectory (ordered by ts, event_id): vertex i carries the running
    arc length cum_i, accumulated in DECIMAL(28,15) so the running sum is
    order-exact and engine-identical (a double running sum would depend on
    the engine's window-aggregation tree). Target j sits at distance
    d_j = (j/(n-1))·L; the covering segment is the LOWEST-index segment
    with cum_i ≤ d_j ≤ cum_{i+1}, and the sample is the linear interpolation
    inside it (t = 0 on zero-length segments). Single-point trajectories
    repeat their point n_samples times.

    Scale shape: ONE shuffle (the per-trajectory window), then a bounded
    n_samples× fan-out of the per-trajectory head row joined back to the
    segment list — per-trajectory work is O(n_points · n_samples), never a
    cross-trajectory product."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("ts", "event_id")
    seg = F.sqrt(
        (F.col("x") - F.lag("x").over(w)) * (F.col("x") - F.lag("x").over(w))
        + (F.col("y") - F.lag("y").over(w)) * (F.col("y") - F.lag("y").over(w))
    )
    cum = F.sum(F.coalesce(seg.cast(DEC), F.lit(0).cast(DEC))).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    pts = events_xy.select(
        F.col(id_col).alias("tid"),
        "ts",
        "event_id",
        "x",
        "y",
        cum.cast("double").alias("cum"),
        (F.row_number().over(w) - 1).alias("vidx"),
    )
    wv = Window.partitionBy("tid").orderBy("vidx")
    segs = pts.select(
        "tid",
        "vidx",
        F.col("x").alias("x0"),
        F.col("y").alias("y0"),
        F.col("cum").alias("c0"),
        F.lead("x").over(wv).alias("x1"),
        F.lead("y").over(wv).alias("y1"),
        F.lead("cum").over(wv).alias("c1"),
    ).where(F.col("x1").isNotNull())
    heads = (
        pts.where(F.col("vidx") == 0)
        .join(
            pts.groupBy("tid").agg(F.max("cum").alias("total")),
            "tid",
        )
        .select("tid", F.col("x").alias("hx"), F.col("y").alias("hy"), "total")
    )
    jcol = F.explode(
        F.array(*[F.lit(j) for j in range(n_samples)])
    ).alias("sample_idx")
    targets = heads.select("tid", "hx", "hy", "total", jcol).select(
        "tid",
        "hx",
        "hy",
        "sample_idx",
        (
            F.col("sample_idx").cast("double")
            / F.lit(float(n_samples - 1))
            * F.col("total")
        ).alias("d"),
    )
    cand = targets.join(segs, "tid", "left").where(
        F.col("vidx").isNull()
        | ((F.col("c0") <= F.col("d")) & (F.col("d") <= F.col("c1")))
    )
    pick = Window.partitionBy("tid", "sample_idx").orderBy(
        F.col("vidx").asc_nulls_last()
    )
    t = F.when(
        F.col("c1") > F.col("c0"),
        (F.col("d") - F.col("c0")) / (F.col("c1") - F.col("c0")),
    ).otherwise(F.lit(0.0))
    return (
        cand.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            F.col("tid").alias(id_col),
            F.col("sample_idx").cast("long").alias("sample_idx"),
            F.round(
                F.coalesce(F.col("x0") + t * (F.col("x1") - F.col("x0")), F.col("hx")),
                9,
            ).alias("sx"),
            F.round(
                F.coalesce(F.col("y0") + t * (F.col("y1") - F.col("y0")), F.col("hy")),
                9,
            ).alias("sy"),
        )
    )


def traj_resample_sql(
    events_xy_sql: str, n_samples: int = 8, id_col: str = "user_id"
) -> str:
    """DuckDB twin of :func:`traj_resample`."""
    return f"""
WITH ev AS ({events_xy_sql}),
p0 AS (
  SELECT {id_col} AS tid, ts, event_id, x, y,
         CAST(sqrt(
             (x - lag(x) OVER w) * (x - lag(x) OVER w)
             + (y - lag(y) OVER w) * (y - lag(y) OVER w)
           ) AS {DEC}) AS segd,
         row_number() OVER w - 1 AS vidx
  FROM ev
  WINDOW w AS (PARTITION BY {id_col} ORDER BY ts, event_id)
),
pts AS (
  SELECT tid, ts, event_id, x, y, vidx,
         CAST(sum(coalesce(segd, CAST(0 AS {DEC})))
           OVER (PARTITION BY tid ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum
  FROM p0
),
segs AS (
  SELECT tid, vidx, x AS x0, y AS y0, cum AS c0,
         lead(x) OVER wv AS x1, lead(y) OVER wv AS y1, lead(cum) OVER wv AS c1
  FROM pts
  WINDOW wv AS (PARTITION BY tid ORDER BY vidx)
  QUALIFY x1 IS NOT NULL
),
heads AS (
  SELECT p.tid, p.x AS hx, p.y AS hy, tot.total
  FROM pts p
  JOIN (SELECT tid, max(cum) AS total FROM pts GROUP BY tid) tot ON tot.tid = p.tid
  WHERE p.vidx = 0
),
targets AS (
  SELECT tid, hx, hy, j.sample_idx,
         (CAST(j.sample_idx AS DOUBLE) / {float(n_samples - 1)!r}) * total AS d
  FROM heads,
       (SELECT unnest(range({n_samples})) AS sample_idx) j
),
cand AS (
  SELECT tg.tid, tg.sample_idx, tg.hx, tg.hy, tg.d,
         s.vidx, s.x0, s.y0, s.c0, s.x1, s.y1, s.c1
  FROM targets tg LEFT JOIN segs s ON s.tid = tg.tid
  WHERE s.vidx IS NULL OR (s.c0 <= tg.d AND tg.d <= s.c1)
  QUALIFY row_number() OVER (
    PARTITION BY tg.tid, tg.sample_idx ORDER BY s.vidx ASC NULLS LAST) = 1
)
SELECT tid AS {id_col}, sample_idx,
       round(coalesce(x0 + (CASE WHEN c1 > c0 THEN (d - c0) / (c1 - c0)
                                 ELSE 0.0 END) * (x1 - x0), hx), 9) AS sx,
       round(coalesce(y0 + (CASE WHEN c1 > c0 THEN (d - c0) / (c1 - c0)
                                 ELSE 0.0 END) * (y1 - y0), hy), 9) AS sy
FROM cand
"""


def od_matrix(
    events_xy: DataFrame,
    res: int,
    id_col: str = "user_id",
    top_k: int = 50,
) -> DataFrame:
    """Origin–destination flow matrix: (o_cell, d_cell, n_trips, avg_len, rnk).

    Each entity's trajectory (ordered by ts, event_id) is reduced to one
    trip — first point → last point — and trips are aggregated into cell-
    to-cell flows at resolution ``res``: the desire-line matrix of movement
    analytics (commute flows, crawl-session drift between embedding-space
    regions). ``avg_len`` is the mean straight-line (desire-line) length of
    the flow's trips; the top-k flows by volume are returned with a dense
    ordering rank.

    Scale shape: ONE groupBy(id) with struct-ordered min/max picks each
    trajectory's endpoints (no window, no second sort — same trick as
    :func:`trajectory_stats`), then ONE groupBy on the (o_cell, d_cell)
    pair — cell-pair cardinality, metadata scale. Trip lengths sum in
    DECIMAL so the flow average is partition-order independent; top-k via
    orderBy+limit plans as TakeOrderedAndProject.
    """
    pt = F.struct("ts", "event_id", "x", "y")
    ends = events_xy.groupBy(id_col).agg(
        F.min(pt).alias("p0"), F.max(pt).alias("p1")
    )
    length = F.sqrt(
        (F.col("p1.x") - F.col("p0.x")) * (F.col("p1.x") - F.col("p0.x"))
        + (F.col("p1.y") - F.col("p0.y")) * (F.col("p1.y") - F.col("p0.y"))
    )
    trips = ends.select(
        G.cell_col(F.col("p0.x"), F.col("p0.y"), res).alias("o_cell"),
        G.cell_col(F.col("p1.x"), F.col("p1.y"), res).alias("d_cell"),
        length.cast(DEC).alias("len"),
    )
    flows = trips.groupBy("o_cell", "d_cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_trips"),
        F.sum("len").alias("len_sum"),
    )
    scored = flows.select(
        "o_cell",
        "d_cell",
        "n_trips",
        F.round(
            F.col("len_sum").cast("double") / F.col("n_trips").cast("double"), 6
        ).alias("avg_len"),
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("n_trips"), "o_cell", "d_cell").limit(top_k)
    w = Window.orderBy(F.desc("n_trips"), "o_cell", "d_cell")
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def od_matrix_sql(
    events_xy_sql: str, res: int, id_col: str = "user_id", top_k: int = 50
) -> str:
    """DuckDB twin of :func:`od_matrix`."""
    return f"""
WITH ev AS ({events_xy_sql}),
ends AS (
  SELECT {id_col},
         min(struct_pack(ts := ts, event_id := event_id, x := x, y := y)) AS p0,
         max(struct_pack(ts := ts, event_id := event_id, x := x, y := y)) AS p1
  FROM ev GROUP BY 1),
trips AS (
  SELECT {G.cell_sql('p0.x', 'p0.y', res)} AS o_cell,
         {G.cell_sql('p1.x', 'p1.y', res)} AS d_cell,
         CAST(sqrt((p1.x - p0.x) * (p1.x - p0.x)
                   + (p1.y - p0.y) * (p1.y - p0.y)) AS {DEC}) AS len
  FROM ends),
flows AS (
  SELECT o_cell, d_cell, CAST(count(*) AS BIGINT) AS n_trips, sum(len) AS len_sum
  FROM trips GROUP BY 1, 2),
scored AS (
  SELECT o_cell, d_cell, n_trips,
         round(CAST(len_sum AS DOUBLE) / CAST(n_trips AS DOUBLE), 6) AS avg_len
  FROM flows)
SELECT o_cell, d_cell, n_trips, avg_len, rnk FROM (
  SELECT o_cell, d_cell, n_trips, avg_len,
         CAST(row_number() OVER (ORDER BY n_trips DESC, o_cell, d_cell) AS BIGINT) AS rnk
  FROM scored) WHERE rnk <= {top_k}
"""


def colocation_pairs(
    events_xy: DataFrame,
    res: int = 5,
    t_eps: int = 3600,
    id_col: str = "user_id",
    min_contacts: int = 1,
) -> DataFrame:
    """(user_a, user_b, n_contacts, n_cells, first_t): co-presence join —
    pairs of DISTINCT entities with events in the SAME res-cell within
    ``t_eps`` seconds (the contact-tracing / co-location-pattern primitive;
    cell width IS the contact radius, the quantization every proximity
    product ships).

    Scale shape: events are keyed by (cell, τ-bucket); each event probes its
    cell at buckets {b−1, b, b+1} and the probe side must carry the LOWER
    user id, so every qualifying event pair is counted exactly once, and the
    join is bounded by per-(cell, bucket) density — never n². first_t is the
    earlier event's epoch second of the earliest contact.
    """
    t = F.unix_timestamp("ts")
    pts = events_xy.select(
        F.col(id_col).alias("uid"),
        t.alias("t"),
        G.cell_col(F.col("x"), F.col("y"), res).alias("cell"),
        F.floor(t.cast("double") / F.lit(float(t_eps))).cast("long").alias("tb"),
    )
    probe = pts.select(
        F.col("uid").alias("uid1"),
        F.col("t").alias("t1"),
        F.col("cell").alias("cell1"),
        F.explode(F.array(F.col("tb") - 1, F.col("tb"), F.col("tb") + 1)).alias("kb"),
    )
    contacts = probe.join(
        pts,
        (F.col("cell1") == F.col("cell"))
        & (F.col("kb") == F.col("tb"))
        & (F.col("uid1") < F.col("uid"))
        & (F.abs(F.col("t1") - F.col("t")) <= t_eps),
    )
    return (
        contacts.groupBy(
            F.col("uid1").alias("user_a"), F.col("uid").alias("user_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_contacts"),
            F.countDistinct("cell1").cast("long").alias("n_cells"),
            F.min(F.least("t1", "t")).alias("first_t"),
        )
        .where(F.col("n_contacts") >= min_contacts)
    )


def colocation_pairs_sql(
    events_xy_sql: str,
    res: int = 5,
    t_eps: int = 3600,
    id_col: str = "user_id",
    min_contacts: int = 1,
) -> str:
    """DuckDB twin of :func:`colocation_pairs`."""
    return f"""
WITH ev AS ({events_xy_sql}),
pts AS (
  SELECT {id_col} AS uid,
         CAST(floor(epoch(ts)) AS BIGINT) AS t,
         {G.cell_sql('x', 'y', res)} AS cell,
         CAST(floor(CAST(CAST(floor(epoch(ts)) AS BIGINT) AS DOUBLE)
                    / {float(t_eps)!r}) AS BIGINT) AS tb
  FROM ev),
probe AS (
  SELECT uid AS uid1, t AS t1, cell AS cell1, tb + db AS kb
  FROM pts, (VALUES (-1), (0), (1)) o(db)),
contacts AS (
  SELECT p.uid1, q.uid, p.cell1, p.t1, q.t
  FROM probe p JOIN pts q
    ON p.cell1 = q.cell AND p.kb = q.tb AND p.uid1 < q.uid
       AND abs(p.t1 - q.t) <= {t_eps})
SELECT uid1 AS user_a, uid AS user_b,
       CAST(count(*) AS BIGINT) AS n_contacts,
       CAST(count(DISTINCT cell1) AS BIGINT) AS n_cells,
       min(least(t1, t)) AS first_t
FROM contacts GROUP BY 1, 2
HAVING count(*) >= {min_contacts}
"""


def traj_simplify(
    events_xy: DataFrame,
    min_area: float = 0.0005,
    id_col: str = "user_id",
) -> DataFrame:
    """Single-pass Visvalingam–Whyatt trajectory simplification:
    (id, event_id, ts, x, y, area) — the points KEPT.

    Every interior point gets its effective area — the area of the triangle
    (prev, point, next) along the (ts, event_id)-ordered trajectory — and is
    dropped when that area falls below ``min_area``; endpoints always
    survive (area = NULL → kept). This is the one-pass variant (areas are
    computed against the ORIGINAL neighbors, not recomputed after each
    removal): deterministic, embarrassingly parallel, and the standard
    choice when simplification must be a streaming map over a partitioned
    corpus rather than an iterative heap algorithm. The decimation step a
    tile renderer applies before drawing long paths at low zoom.

    Scale shape: ONE shuffle — the window partitionBy(id); the area is six
    subtractions and two multiplies of IEEE doubles evaluated in pinned
    order on both engines, so the twin is hash-exact. No UDF, no iteration.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("ts", "event_id")
    xp, yp = F.lag("x").over(w), F.lag("y").over(w)
    xn, yn = F.lead("x").over(w), F.lead("y").over(w)
    area = (
        F.abs(
            (F.col("x") - xp) * (yn - yp) - (xn - xp) * (F.col("y") - yp)
        )
        * 0.5
    )
    stepped = events_xy.select(
        id_col, "event_id", "ts", "x", "y", F.round(area, 9).alias("area")
    )
    return stepped.where(F.col("area").isNull() | (F.col("area") >= min_area))


def traj_simplify_sql(
    events_xy_sql: str, min_area: float = 0.0005, id_col: str = "user_id"
) -> str:
    """DuckDB twin of :func:`traj_simplify`."""
    return f"""
WITH ev AS ({events_xy_sql}),
stepped AS (
  SELECT {id_col}, event_id, ts, x, y,
         round(abs((x - lag(x) OVER w) * (lead(y) OVER w - lag(y) OVER w)
                   - (lead(x) OVER w - lag(x) OVER w) * (y - lag(y) OVER w)) * 0.5,
               9) AS area
  FROM ev
  WINDOW w AS (PARTITION BY {id_col} ORDER BY ts, event_id)
)
SELECT * FROM stepped WHERE area IS NULL OR area >= {min_area!r}
"""


def weekday_effect(events: DataFrame) -> DataFrame:
    """(dow, n, expected, chi2_term) + the 7-row chi-square decomposition of
    day-of-week seasonality in event volume — expected = N/7 uniform;
    Σ chi2_term ≫ 14 rejects 'no weekly rhythm'. dow 1 = Sunday (Spark
    dayofweek convention, mirrored in the twin via DuckDB dayofweek+1)."""
    from pyspark.sql import functions as F

    d = events.select(F.dayofweek("ts").alias("dow"))
    counts = d.groupBy("dow").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("n_tot"))
    z = counts.crossJoin(F.broadcast(tot))
    exp = F.col("n_tot").cast("double") / F.lit(7.0)
    dev = F.col("n").cast("double") - exp
    return z.select(
        "dow",
        "n",
        F.round(exp, 6).alias("expected"),
        F.round(dev * dev / exp, 6).alias("chi2_term"),
    )


def weekday_effect_sql(events_sql: str) -> str:
    """DuckDB twin of :func:`weekday_effect`. DuckDB dayofweek: 0=Sunday;
    Spark: 1=Sunday — the +1 pins them to the same labels."""
    return f"""
WITH d AS (SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow FROM ({events_sql})),
counts AS (SELECT dow, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY dow),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM counts)
SELECT dow, n,
       round(CAST(n_tot AS DOUBLE) / 7.0, 6) AS expected,
       round((CAST(n AS DOUBLE) - CAST(n_tot AS DOUBLE) / 7.0)
             * (CAST(n AS DOUBLE) - CAST(n_tot AS DOUBLE) / 7.0)
             / (CAST(n_tot AS DOUBLE) / 7.0), 6) AS chi2_term
FROM counts, tot
"""


def gap_burstiness(
    events: DataFrame, min_events: int = 10, top_k: int = 100
) -> DataFrame:
    """(user_id, n_gaps, mean_gap, sd_gap, b, rnk): Goh-Barabási
    burstiness B = (σ − μ)/(σ + μ) of each user's inter-event times —
    B → 1 bursty (heavy-tailed gaps), 0 Poisson, → −1 metronomic. The
    temporal sibling of the term Fano factor; top-``top_k`` burstiest
    users with ≥ ``min_events`` events.

    Gaps via one per-user lag window; population moments from DECIMAL
    sums (σ = √(E[g²] − μ²), clamped at 0); ties → user_id."""
    from pyspark.sql import Window, functions as F

    t = F.unix_timestamp("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    gaps = (
        events.select("event_id", "user_id", t.alias("t"))
        .withColumn("gap", (F.col("t") - F.lag("t").over(w)).cast("double"))
        .where(F.col("gap").isNotNull())
    )
    m = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(F.col("gap").cast("decimal(28,6)")).cast("double").alias("s1"),
        F.sum((F.col("gap") * F.col("gap")).cast("decimal(28,6)"))
        .cast("double")
        .alias("s2"),
    ).where(F.col("n_gaps") >= min_events - 1)
    nd = F.col("n_gaps").cast("double")
    mu = F.col("s1") / nd
    var = F.col("s2") / nd - mu * mu
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    scored = m.select(
        "user_id",
        "n_gaps",
        F.round(mu, 6).alias("mean_gap"),
        F.round(sd, 6).alias("sd_gap"),
        F.round((sd - mu) / (sd + mu), 6).alias("b"),
    )
    # distributed top-k FIRST (TakeOrdered: per-partition partial top-k +
    # driver merge), THEN the rank window over ≤ top_k rows — never a
    # single-partition sort of every user
    top = scored.orderBy(F.desc("b"), "user_id").limit(top_k)
    rw = Window.orderBy(F.desc("b"), "user_id")
    return top.withColumn("rnk", F.row_number().over(rw).cast("long"))


def gap_burstiness_sql(
    events_sql: str, min_events: int = 10, top_k: int = 100
) -> str:
    """DuckDB twin of :func:`gap_burstiness`."""
    return f"""
WITH base AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM ({events_sql})),
gaps AS (
  SELECT user_id,
         CAST(t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
              AS DOUBLE) AS gap
  FROM base QUALIFY gap IS NOT NULL),
m AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(CAST(gap AS DECIMAL(28,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(gap * gap AS DECIMAL(28,6))) AS DOUBLE) AS s2
  FROM gaps GROUP BY user_id HAVING count(*) >= {min_events - 1}),
scored AS (
  SELECT user_id, n_gaps,
         round(s1 / CAST(n_gaps AS DOUBLE), 6) AS mean_gap,
         round(sqrt(greatest(s2 / CAST(n_gaps AS DOUBLE)
                             - (s1 / CAST(n_gaps AS DOUBLE))
                               * (s1 / CAST(n_gaps AS DOUBLE)), 0.0)), 6) AS sd_gap,
         round((sqrt(greatest(s2 / CAST(n_gaps AS DOUBLE)
                              - (s1 / CAST(n_gaps AS DOUBLE))
                                * (s1 / CAST(n_gaps AS DOUBLE)), 0.0))
                - s1 / CAST(n_gaps AS DOUBLE))
               / (sqrt(greatest(s2 / CAST(n_gaps AS DOUBLE)
                                - (s1 / CAST(n_gaps AS DOUBLE))
                                  * (s1 / CAST(n_gaps AS DOUBLE)), 0.0))
                  + s1 / CAST(n_gaps AS DOUBLE)), 6) AS b
  FROM m)
SELECT user_id, n_gaps, mean_gap, sd_gap, b,
       CAST(row_number() OVER (ORDER BY b DESC, user_id) AS BIGINT) AS rnk
FROM scored QUALIFY rnk <= {top_k}
"""


def ipf_balance(
    events_xy: DataFrame,
    res: int = 3,
    id_col: str = "user_id",
    growth_o: float = 1.5,
    growth_d: float = 1.2,
    rounds: int = 4,
) -> DataFrame:
    """Furness / IPF balancing of the OD flow matrix: scale observed flows
    to satisfy grown row (origin) and column (destination) targets —
    origin totals ×``growth_o``, destination totals ×``growth_d``
    (renormalized to the origin grand total so margins are consistent) —
    by ``rounds`` alternating row/column factor sweeps. THE trip-matrix
    forecasting step of four-step travel models, and a general-purpose
    raking/calibration primitive (survey weighting, dasymetric refinement).

    Output per OD pair: (o_cell, d_cell, flow, balanced) after the final
    sweep; row margins match targets exactly (a row sweep runs last... )
    — column margins converge geometrically and the SAME round count runs
    in the twin, so results are hash-identical even mid-convergence.

    Scale shape: trips via the struct-min/max groupBy; everything after is
    cell-pair metadata — each sweep is one groupBy + one broadcast join
    back. DECIMAL margin sums, pinned division order."""
    DECs = "decimal(28,15)"
    pt = F.struct("ts", "event_id", "x", "y")
    ends = events_xy.groupBy(id_col).agg(F.min(pt).alias("p0"), F.max(pt).alias("p1"))
    trips = ends.select(
        G.cell_col(F.col("p0.x"), F.col("p0.y"), res).alias("o_cell"),
        G.cell_col(F.col("p1.x"), F.col("p1.y"), res).alias("d_cell"),
    )
    flows = (
        trips.groupBy("o_cell", "d_cell")
        .agg(F.count(F.lit(1)).cast("long").alias("flow"))
        .where(F.col("o_cell") != F.col("d_cell"))
    ).localCheckpoint(eager=True)
    t_o = flows.groupBy("o_cell").agg(
        (F.sum(F.col("flow").cast(DECs)).cast("double") * F.lit(growth_o)).alias("target_o")
    )
    # destination targets renormalized so Σtargets_d == Σtargets_o (IPF
    # needs consistent margins); the scalar ratio is a 1-row broadcast
    grand_o = flows.agg(
        (F.sum(F.col("flow").cast(DECs)).cast("double") * F.lit(growth_o)).alias("go")
    )
    raw_d = flows.groupBy("d_cell").agg(
        (F.sum(F.col("flow").cast(DECs)).cast("double") * F.lit(growth_d)).alias("raw_d")
    )
    grand_d = raw_d.agg(F.sum(F.col("raw_d").cast(DECs)).cast("double").alias("gd"))
    t_d = raw_d.crossJoin(F.broadcast(grand_o)).crossJoin(F.broadcast(grand_d)).select(
        "d_cell", (F.col("raw_d") * F.col("go") / F.col("gd")).alias("target_d")
    )
    bal = flows.select("o_cell", "d_cell", "flow", F.col("flow").cast("double").alias("b"))
    for _ in range(rounds):
        # column sweep then row sweep (row last ⇒ row margins exact)
        cm = bal.groupBy("d_cell").agg(
            F.sum(F.col("b").cast(DECs)).cast("double").alias("m_d")
        )
        bal = (
            bal.join(F.broadcast(cm), "d_cell")
            .join(F.broadcast(t_d), "d_cell")
            .select(
                "o_cell", "d_cell", "flow",
                (F.col("b") * (F.col("target_d") / F.col("m_d"))).alias("b"),
            )
        )
        rm = bal.groupBy("o_cell").agg(
            F.sum(F.col("b").cast(DECs)).cast("double").alias("m_o")
        )
        bal = (
            bal.join(F.broadcast(rm), "o_cell")
            .join(F.broadcast(t_o), "o_cell")
            .select(
                "o_cell", "d_cell", "flow",
                (F.col("b") * (F.col("target_o") / F.col("m_o"))).alias("b"),
            )
            .localCheckpoint(eager=True)
        )
    return bal.select("o_cell", "d_cell", "flow", F.round("b", 6).alias("balanced"))


def ipf_balance_sql(
    events_xy_sql: str,
    res: int = 3,
    id_col: str = "user_id",
    growth_o: float = 1.5,
    growth_d: float = 1.2,
    rounds: int = 4,
) -> str:
    """DuckDB twin of :func:`ipf_balance` — sweeps textually unrolled."""
    DECs = "DECIMAL(28,15)"
    cell_o = G.cell_sql("p0.x", "p0.y", res)
    cell_d = G.cell_sql("p1.x", "p1.y", res)
    ctes = [
        f"ev AS ({events_xy_sql})",
        f"""ends AS (
  SELECT {id_col},
         min(struct_pack(ts := ts, event_id := event_id, x := x, y := y)) AS p0,
         max(struct_pack(ts := ts, event_id := event_id, x := x, y := y)) AS p1
  FROM ev GROUP BY 1)""",
        f"trips AS (SELECT {cell_o} AS o_cell, {cell_d} AS d_cell FROM ends)",
        """flows AS MATERIALIZED (
  SELECT o_cell, d_cell, count(*)::BIGINT AS flow
  FROM trips GROUP BY 1, 2 HAVING o_cell <> d_cell)""",
        f"""t_o AS (SELECT o_cell,
  CAST(sum(CAST(flow AS {DECs})) AS DOUBLE) * {growth_o!r} AS target_o
  FROM flows GROUP BY o_cell)""",
        f"""go AS (SELECT CAST(sum(CAST(flow AS {DECs})) AS DOUBLE) * {growth_o!r} AS go FROM flows)""",
        f"""raw_d AS (SELECT d_cell,
  CAST(sum(CAST(flow AS {DECs})) AS DOUBLE) * {growth_d!r} AS raw_d
  FROM flows GROUP BY d_cell)""",
        f"""gd AS (SELECT CAST(sum(CAST(raw_d AS {DECs})) AS DOUBLE) AS gd FROM raw_d)""",
        """t_d AS (SELECT d_cell,
  raw_d * (SELECT go FROM go) / (SELECT gd FROM gd) AS target_d FROM raw_d)""",
        "b0 AS (SELECT o_cell, d_cell, flow, CAST(flow AS DOUBLE) AS b FROM flows)",
    ]
    prev = "b0"
    for i in range(1, rounds + 1):
        ctes.append(f"""c{i} AS (
  SELECT x.o_cell, x.d_cell, x.flow,
         x.b * (t.target_d / m.m_d) AS b
  FROM {prev} x
  JOIN (SELECT d_cell, CAST(sum(CAST(b AS {DECs})) AS DOUBLE) AS m_d
        FROM {prev} GROUP BY d_cell) m ON m.d_cell = x.d_cell
  JOIN t_d t ON t.d_cell = x.d_cell)""")
        ctes.append(f"""b{i} AS MATERIALIZED (
  SELECT x.o_cell, x.d_cell, x.flow,
         x.b * (t.target_o / m.m_o) AS b
  FROM c{i} x
  JOIN (SELECT o_cell, CAST(sum(CAST(b AS {DECs})) AS DOUBLE) AS m_o
        FROM c{i} GROUP BY o_cell) m ON m.o_cell = x.o_cell
  JOIN t_o t ON t.o_cell = x.o_cell)""")
        prev = f"b{i}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT o_cell, d_cell, flow, round(b, 6) AS balanced FROM {prev}"
    )
