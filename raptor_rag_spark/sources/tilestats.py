"""Persisted, incrementally-maintained tile-stats table (materialized view).

At 100 TB the per-cell raster bands (point count, centroid, token mass) are
computed ONCE and then maintained from crawl deltas — the tile server reads
the stats table, never the raw corpus. This is exact incremental VIEW
MAINTENANCE, one step beyond the SearchIndex's append-only postings
(sources/searchindex.py): the state is the PARTIAL AGGREGATE per finest-level
cell, and a delta folds in through a full-outer MERGE that keeps state size
O(#cells), not O(#rows ever ingested).

Exactness argument (what the `tile_incremental` contract twin asserts
against a full-recompute DuckDB oracle):

- counts are BIGINT adds;
- coordinate masses are kept as DECIMAL(28,15) sums — each input coordinate
  is cast to decimal ONCE (deterministic IEEE→decimal rounding), after which
  summation is associative and commutative, so any grouping of the inputs
  (one batch, many batches, any partitioning) yields bit-identical totals;
- derived doubles (centroid = mass/count) are computed only at READ time
  from the exact partials, with the same single-op expressions at every
  resolution.

Because the partials are additive, any COARSER resolution rolls up from the
finest-level state with one metadata-scale groupBy (`read_stats(res)`) — the
raster pyramid is free, no raw-data rescan at any level.

Snapshots inherit the LakeTable's atomic commits, time travel ("the map as
of snapshot N") and exactly-once `epoch_id` semantics for streaming
maintenance; `refresh_from` closes the CDC loop with a corpus lake table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from .lakehouse import LakeTable

DEC = "decimal(28,15)"


def _partials(pts: DataFrame, res: int) -> DataFrame:
    """(cell_id, n, sx, sy): exact partial aggregates at the finest level.
    ONE shuffle with map-side combine; pts is (x, y, ...)."""
    return pts.groupBy(G.cell_col(F.col("x"), F.col("y"), res).alias("cell_id")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(DEC)).cast(DEC).alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast(DEC).alias("sy"),
    )


class TileStatsTable:
    """Snapshot-versioned per-cell aggregate state at resolution ``res``."""

    def __init__(self, root: str, res: int):
        self.table = LakeTable(root)
        self.res = res

    # ---------------------------------------------------------------- build
    def build(self, pts: DataFrame) -> int:
        """Full (re)build: one aggregation, one overwrite commit."""
        return self.table.overwrite(_partials(pts, self.res))

    def add_points(self, pts: DataFrame, epoch_id: int | None = None) -> int:
        """Exact incremental maintenance: aggregate the delta, MERGE into
        the current state (full-outer on cell_id, BIGINT/DECIMAL adds), one
        overwrite commit. State stays O(#cells).

        ``epoch_id`` gives the merge exactly-once semantics under streaming
        re-delivery: a replayed micro-batch would DOUBLE-COUNT its points
        (overwrite-of-merged-state is not naturally idempotent the way an
        append is), so the epoch check must gate the merge itself."""
        if epoch_id is not None:
            done = self.table._find_epoch(epoch_id)
            if done is not None:
                return done
        spark = pts.sparkSession
        delta = _partials(pts, self.res)
        try:
            old = self.table.read(spark)
        except FileNotFoundError:
            # first delta on an empty table: the merge identity — lets a
            # streaming sink build the view from nothing, batch by batch
            old = spark.createDataFrame(
                [], f"cell_id long, n long, sx {DEC}, sy {DEC}"
            )
        zero = F.lit(0).cast(DEC)
        merged = (
            old.select(
                "cell_id",
                F.col("n").alias("n_a"),
                F.col("sx").alias("sx_a"),
                F.col("sy").alias("sy_a"),
            )
            .join(
                delta.select(
                    "cell_id",
                    F.col("n").alias("n_b"),
                    F.col("sx").alias("sx_b"),
                    F.col("sy").alias("sy_b"),
                ),
                "cell_id",
                "full_outer",
            )
            .select(
                "cell_id",
                (F.coalesce(F.col("n_a"), F.lit(0)) + F.coalesce(F.col("n_b"), F.lit(0))).alias("n"),
                (F.coalesce(F.col("sx_a"), zero) + F.coalesce(F.col("sx_b"), zero)).cast(DEC).alias("sx"),
                (F.coalesce(F.col("sy_a"), zero) + F.coalesce(F.col("sy_b"), zero)).cast(DEC).alias("sy"),
            )
        )
        # the merge reads the table's current files and the commit replaces
        # them; materialize before the overwrite invalidates the snapshot
        merged = merged.localCheckpoint(eager=True)
        extra = {"epoch_id": epoch_id} if epoch_id is not None else None
        return self.table.overwrite(merged, extra=extra)

    def streaming_sink(self):
        """``writeStream.foreachBatch(stats.streaming_sink())`` — each
        micro-batch folds into the per-cell state exactly once (epoch-gated
        merge), turning the stats table into a live materialized view."""

        def _sink(batch_df: DataFrame, epoch_id: int) -> None:
            self.add_points(batch_df, epoch_id=epoch_id)

        return _sink

    def refresh_from(
        self,
        corpus: LakeTable,
        from_snapshot: int,
        to_snapshot: int,
    ) -> int:
        """Fold a corpus-table CDC range into the stats: the rows appended
        in (from, to] are exactly the not-yet-counted points."""
        spark = SparkSession.getActiveSession()
        delta = corpus.changes_between(spark, from_snapshot, to_snapshot)
        return self.add_points(delta)

    # ---------------------------------------------------------------- read
    def partials(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        return self.table.read(spark, snapshot_id)

    def read_stats(
        self, spark: SparkSession, res: int | None = None, snapshot_id: int | None = None
    ) -> DataFrame:
        """(cell_id, n, centroid_x, centroid_y) at any resolution ≤ the
        table's: coarser levels roll up from the exact partials (additive),
        so the whole pyramid reads from O(#cells) state."""
        out_res = self.res if res is None else res
        if out_res > self.res:
            raise ValueError(
                f"res {out_res} finer than maintained resolution {self.res}"
            )
        p = self.partials(spark, snapshot_id)
        if out_res < self.res:
            p = (
                p.groupBy(
                    G.cell_parent_col(F.col("cell_id"), self.res - out_res).alias("cell_id")
                )
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("sx").cast(DEC).alias("sx"),
                    F.sum("sy").cast(DEC).alias("sy"),
                )
            )
        return p.select(
            "cell_id",
            "n",
            F.round(F.col("sx").cast("double") / F.col("n"), 6).alias("centroid_x"),
            F.round(F.col("sy").cast("double") / F.col("n"), 6).alias("centroid_y"),
        )
