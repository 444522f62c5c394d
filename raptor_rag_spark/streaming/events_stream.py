"""Structured Streaming surface: event-time tumbling windows with watermarks.

The reference has no streaming (SURVEY.md §2.9) and the north rule requires
batch + checkpoint/resume; this module is the optional streaming ingest demo
that the input schema's ``warc_ts`` (here: events.ts) makes natural. It is a
REAL Structured Streaming job — readStream over the parquet dir, event-time
watermark, tumbling window agg, availableNow trigger draining to a memory
sink — whose output provably equals the batch twin (contract query
``events_hourly``), which is what makes it testable without a live source.

At scale the same plan runs against a file/Kafka source with a real trigger;
state cleanup is bounded by the watermark.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events_hourly(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "2 hours",
    timeout_s: int = 300,
) -> DataFrame:
    """Windowed per-type counts+sums over a stream of the events table,
    drained with Trigger.AvailableNow; returns the final result DataFrame
    (same columns as the batch twin: hour_ts, event_type, n, value_sum)."""
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the sf dir holds several tables; restrict to the events file
    stream = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # watermarks require TIMESTAMP (ltz); the session tz is UTC so the cast
    # from the parquet NTZ values is value-preserving
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("value_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
            "n",
            "value_sum",
        )
    )
    sink = f"events_hourly_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        # a partial drain would surface downstream as a confusing oracle
        # mismatch; fail loudly at the source instead
        q.stop()
        raise TimeoutError(
            f"availableNow drain did not finish within {timeout_s}s "
            f"(query {sink}); result would be partial"
        )
    return spark.table(sink)


def stream_sessionize(
    spark: SparkSession,
    sf_dir: str,
    gap_s: int = 1800,
    timeout_s: int = 300,
    source_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Gap-based sessionization as a REAL stateful streaming operator
    (applyInPandasWithState): per-user state carries (last event epoch,
    current session ordinal) across micro-batches, so sessions spanning
    batch boundaries are stitched correctly — the semantics the batch twin
    (contract query ``events_sessionize``) expresses with lag + cumulative
    windows. Drained with Trigger.AvailableNow; output (user_id, event_id,
    session_id) must equal the batch twin exactly.

    ``source_dir``/``max_files_per_trigger`` let tests feed a multi-file copy
    of the events table in several micro-batches (files must be ordered by
    event time per user, which is how a log source delivers them); by default
    the single events.parquet drains in one batch.

    Scale shape: state is two longs per user key, partitioned by user_id —
    the standard streaming-aggregation layout; watermark-less NoTimeout state
    is fine here because the key space is the user population.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = spark.readStream.schema(batch_schema).format("parquet")
    if source_dir is None:
        stream = reader.option("pathGlobFilter", "events.parquet").load(sf_dir)
    else:
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        # latestFirst=False (default) + one file per trigger = time-ordered batches
        stream = reader.load(source_dir)

    stream = stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))

    def sessionize(key, pdf_iter, state: GroupState):
        last_epoch, session = state.get if state.exists else (None, 0)
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            epochs = pdf["ts"].astype("int64") // 1_000_000_000
            sess = []
            for e in epochs:
                if last_epoch is None or e - last_epoch > gap_s:
                    session += 1
                sess.append(session)
                last_epoch = int(e)
            out.append(
                pd.DataFrame(
                    {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "session_id": sess}
                )
            )
        state.update((last_epoch, session))
        yield from out

    result = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            outputStructType="user_id LONG, event_id LONG, session_id LONG",
            stateStructType="last_epoch LONG, session LONG",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = f"sessionize_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    q = (
        result.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"availableNow drain did not finish within {timeout_s}s "
            f"(query {sink}); result would be partial"
        )
    return spark.table(sink)


def stream_enrich(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "2 hours",
    timeout_s: int = 300,
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: the events stream is
    joined to the STATIC customer dimension (broadcast — stream-static joins
    are stateless, the canonical way to attach dimensions in-flight), then
    aggregated per (hour, market segment). Returns (hour_ts, c_mktsegment,
    n, value_sum) equal to the batch twin.

    Scale shape: the dimension is broadcast once per micro-batch (cache it
    if hot); no state beyond the windowed agg, whose cleanup the watermark
    bounds."""
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = stream.join(F.broadcast(dim), stream.user_id == dim.c_custkey)
    agg = (
        enriched.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("value_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "c_mktsegment",
            "n",
            "value_sum",
        )
    )
    sink = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"availableNow drain did not finish within {timeout_s}s "
            f"(query {sink}); result would be partial"
        )
    return spark.table(sink)


def stream_late_drop(
    spark: SparkSession,
    sf_dir: str,
    delay_s: int = 3600,
    timeout_s: int = 300,
) -> DataFrame:
    """Watermark late-data semantics, demonstrated end-to-end: the events
    table is split into four time-ordered arrival batches — early rows, the
    LATEST third in two halves (which advance the watermark to
    max(ts) − delay), then a final batch holding the MIDDLE third, which now
    arrives hours below the watermark and must be dropped by the windowed
    aggregation.

    The latest third arrives as TWO batches because Spark (3.4+) keeps two
    watermark values per micro-batch: late-event *filtering* uses the
    watermark derived from data through batch N−2, while state *eviction*
    uses data through batch N−1 — so a late batch arriving immediately after
    the watermark-advancing batch is NOT yet filtered. The extra batch lets
    the advanced watermark settle before the late rows land.

    Batch boundaries are integer-second arithmetic on (min, max) event time
    (d1 = lo + span/3, d2 = lo + 2·span/3), so the batch twin can replicate
    the feed exactly: kept rows = epochs < d1 or ≥ d2; emitted windows =
    finalized ones (window end ≤ final watermark). Returns (hour_ts,
    event_type, n, value_sum) for the emitted windows.

    Scale: watermarks are THE state-bound for streaming aggs — without the
    drop, a year-late row would keep every historical window alive."""
    import tempfile
    import time as _time

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "_epoch", F.col("ts").cast("timestamp_ltz").cast("long")
    )
    lo, hi = ev.agg(F.min("_epoch"), F.max("_epoch")).first()
    span = hi - lo
    d1 = lo + span // 3
    d2 = lo + (2 * span) // 3
    d3 = lo + (5 * span) // 6  # latest-third split; d3 − d2 = span/6
    # a middle row's hour window can end as late as d2 + 3600; it is only
    # filtered when that end sits below the batch-3 late-event watermark
    # (≈ d3 − delay), so the split gap must exceed delay + window size
    if span // 6 <= delay_s + 3600:
        raise ValueError(
            f"event span {span}s too short for delay {delay_s}s: the middle "
            "third's windows would not be below the watermark when they arrive"
        )
    src = tempfile.mkdtemp(prefix="stream_late_src_")
    batches = [
        ev.where(F.col("_epoch") < d1),
        ev.where((F.col("_epoch") >= d2) & (F.col("_epoch") < d3)),
        ev.where(F.col("_epoch") >= d3),  # settles the watermark at hi − delay
        ev.where((F.col("_epoch") >= d1) & (F.col("_epoch") < d2)),  # late
    ]
    for i, b in enumerate(batches):
        b.drop("_epoch").coalesce(1).write.parquet(f"{src}/b{i}")
        _time.sleep(1.1)  # file-source batch order is modification time

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(f"{src}/*/")
    )
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    agg = (
        stream.withWatermark("ts", f"{delay_s} seconds")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("value_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
            "n",
            "value_sum",
        )
    )
    sink = f"late_drop_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"availableNow drain did not finish within {timeout_s}s "
            f"(query {sink}); result would be partial"
        )
    return spark.table(sink)


def stream_stream_join(
    spark: SparkSession,
    sf_dir: str,
    interval_s: int = 1800,
    timeout_s: int = 300,
) -> DataFrame:
    """Stream-stream interval join — the canonical two-stream pattern
    (conversion attribution): a stream of signups joined to a stream of
    purchases by the same user within ``interval_s`` seconds of the signup.
    Both sides are REAL file streams with event-time watermarks; the join
    condition carries the time bound (p.ts ∈ [s.ts, s.ts + interval]), which
    is what lets Spark expire join state — without it a stream-stream join
    buffers both streams forever. Returns (user_id, signup_id, purchase_id,
    value); inner-join matches emit as they are found, so the availableNow
    drain equals the batch interval join exactly.

    Scale shape: state per side is bounded by watermark + interval; the join
    itself shuffles both streams on user_id once per micro-batch."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = tempfile.mkdtemp(prefix="stream_ssj_")
    ev.where(F.col("event_type") == "signup").coalesce(1).write.parquet(f"{src}/signup")
    ev.where(F.col("event_type") == "purchase").coalesce(1).write.parquet(f"{src}/purchase")

    def _read(sub: str) -> DataFrame:
        s = (
            spark.readStream.schema(ev.schema)
            .format("parquet")
            .load(f"{src}/{sub}")
        )
        return s.withColumn("ts", F.col("ts").cast("timestamp_ltz"))

    s = _read("signup").select(
        F.col("user_id").alias("s_user"),
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_ts"),
    ).withWatermark("s_ts", "1 hour")
    p = _read("purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    ).withWatermark("p_ts", "1 hour")
    joined = s.join(
        p,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr(f"INTERVAL {interval_s} SECONDS")),
    ).select(F.col("s_user").alias("user_id"), "signup_id", "purchase_id", "value")
    sink = f"ssj_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"availableNow drain did not finish within {timeout_s}s "
            f"(query {sink}); result would be partial"
        )
    return spark.table(sink)


def stream_dedup(
    spark: SparkSession,
    sf_dir: str,
    timeout_s: int = 300,
    source_dir: str | None = None,
) -> DataFrame:
    """Streaming exact-dedup rollup: per-content-fingerprint canonical id and
    duplicate count maintained as STREAMING AGGREGATION STATE — the ingest-
    time dedup a crawl pipeline runs so duplicates never reach storage.
    State per key is (min doc_id, count); outputMode complete + availableNow
    drain makes the result deterministic and equal to the batch twin
    (min/count are order-free), unlike streaming dropDuplicates whose
    keep-first winner depends on arrival order.

    Returns (fingerprint, canonical_id, n_dups). ``source_dir`` points the
    stream at a plain parquet directory (tests / multi-file feeds); by
    default the single documents.parquet file in ``sf_dir`` drains."""
    from ..functions import sqlgen as G

    batch_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    reader = spark.readStream.schema(batch_schema).format("parquet")
    if source_dir is None:
        stream = reader.option("pathGlobFilter", "documents.parquet").load(sf_dir)
    else:
        stream = reader.load(source_dir)
    agg = (
        stream.select("doc_id", G.fingerprint_col(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_dups"),
        )
    )
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"availableNow drain did not finish within {timeout_s}s "
            f"(query {sink}); result would be partial"
        )
    return spark.table(sink)


def stream_hex_density(
    spark: SparkSession,
    sf_dir: str,
    res: int = 4,
    watermark: str = "2 days",
    timeout_s: int = 300,
) -> DataFrame:
    """Streaming hexagonal tile rollup: events stream in, each is placed at
    its user's embedding-plane location (stream-static broadcast join — the
    dim side is the static embeddings table), assigned a hexagon (pure
    column cube-rounding, functions/hexgen.py), and counted per
    (day window, hexagon) under a watermark. The lattice analytics of the
    batch engine, running as a real Structured Streaming job; output equals
    the batch twin bit-for-bit (contract query ``stream_hex_density``).

    Scale: the static side is broadcast (no stream repartition for the
    join); state is one count per (day, occupied hex). NOTE: this demo
    drains with outputMode('complete') so the memory sink holds the full
    result for the oracle compare — in complete mode Spark does NOT evict
    aggregation state at the watermark; a continuous deployment of this
    plan should run update/append mode, where the same watermark bounds
    state to live day windows."""
    from ..functions import hexgen as H
    from ..functions import sqlgen as G

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x, y = G.xy_cols(F.col("embedding"), 64)
    locs = em.select("vec_id", x.alias("x0"), y.alias("y0"))
    n_locs = em.agg(F.max("vec_id")).collect()[0][0] + 1  # metadata scalar
    jx = ((F.col("event_id") % 199) - 99) / 1000.0
    jy = ((F.col("event_id") % 211) - 105) / 1000.0
    pts = stream.join(F.broadcast(locs), stream["user_id"] % n_locs == locs["vec_id"]).select(
        "ts",
        F.greatest(F.least(F.col("x0") + jx, F.lit(1.0)), F.lit(0.0)).alias("x"),
        F.greatest(F.least(F.col("y0") + jy, F.lit(1.0)), F.lit(0.0)).alias("y"),
    )
    q_, r_ = H.hex_qr_cols(F.col("x"), F.col("y"), res)
    agg = (
        pts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), q_.alias("hex_q"), r_.alias("hex_r"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "hex_q",
            "hex_r",
            "n",
        )
    )
    sink = f"hex_density_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"stream_hex_density did not drain within {timeout_s}s")
    return spark.table(sink)


def stream_tile_stats(
    spark: SparkSession,
    sf_dir: str,
    res: int = 6,
    n_files: int = 4,
    timeout_s: int = 300,
) -> DataFrame:
    """Live materialized tile view: events stream in micro-batches
    (maxFilesPerTrigger=1 over a multi-file copy, so the drain really spans
    several epochs), each event is placed at its user's embedding-plane
    location (stream-static broadcast join), and a foreachBatch sink folds
    every micro-batch into the persisted TileStatsTable through the
    epoch-gated exact merge (sources/tilestats.py). The final read must
    hash-equal a one-shot batch recompute over the union of all events —
    proving the incremental view is exact across epoch boundaries AND that
    the result is independent of how the stream was chopped into batches.

    Scale: state is O(occupied cells); each micro-batch costs one partial
    aggregation + one metadata-scale merge; a replayed epoch commits
    nothing (exactly-once)."""
    from ..functions import sqlgen as G
    from ..sources.tilestats import TileStatsTable

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = tempfile.mkdtemp(prefix="tilestream_src_")
    ev.repartition(n_files).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x, y = G.xy_cols(F.col("embedding"), 64)
    locs = em.select("vec_id", x.alias("x0"), y.alias("y0"))
    n_locs = em.agg(F.max("vec_id")).collect()[0][0] + 1  # metadata scalar
    jx = ((F.col("event_id") % 199) - 99) / 1000.0
    jy = ((F.col("event_id") % 211) - 105) / 1000.0
    pts = stream.join(
        F.broadcast(locs), stream["user_id"] % n_locs == locs["vec_id"]
    ).select(
        F.greatest(F.least(F.col("x0") + jx, F.lit(1.0)), F.lit(0.0)).alias("x"),
        F.greatest(F.least(F.col("y0") + jy, F.lit(1.0)), F.lit(0.0)).alias("y"),
    )
    stats = TileStatsTable(tempfile.mkdtemp(prefix="tilestream_"), res=res)
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    q = (
        pts.writeStream.foreachBatch(stats.streaming_sink())
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"stream_tile_stats did not drain within {timeout_s}s")
    return stats.read_stats(spark)


def stream_cusum(
    spark: SparkSession,
    sf_dir: str,
    period_s: int = 3600,
    k: int = 80,
    h: int = 200,
    timeout_s: int = 300,
    source_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming CUSUM change detection per event type — a REAL stateful
    operator (applyInPandasWithState) with INTEGER state, so the stream and
    the batch twin agree bit-for-bit: per type, hourly event counts x_t
    drive S_t = max(0, S_{t-1} + x_t − k); ``alarm`` fires at S_t > h.
    State per key = (current period, its running count, S). A period emits
    when the next period's first event closes it; each type's final
    (never-closed) period is therefore absent — the twin excludes it
    identically. Periods without events are skipped (not zero-filled) on
    both sides.

    The batch oracle avoids re-running the recursion: with integer sums,
    S_t = cum_t − min(0, min_{j≤t} cum_j) where cum = Σ(x−k) — a
    cumulative sum plus a running min, both plain windows. Integer
    arithmetic end-to-end means no float-order hazard anywhere."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = spark.readStream.schema(batch_schema).format("parquet")
    if source_dir is None:
        stream = reader.option("pathGlobFilter", "events.parquet").load(sf_dir)
    else:
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.load(source_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))

    def cusum(key, pdf_iter, state: GroupState):
        cur_p, cur_n, s = state.get if state.exists else (None, 0, 0)
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            periods = (pdf["ts"].astype("int64") // 1_000_000_000) // period_s
            rows = []
            for p in periods:
                p = int(p)
                if cur_p is None:
                    cur_p, cur_n = p, 1
                elif p == cur_p:
                    cur_n += 1
                else:
                    s = max(0, s + cur_n - k)
                    rows.append((key[0], cur_p, cur_n, s, s > h))
                    cur_p, cur_n = p, 1
            if rows:
                out.append(
                    pd.DataFrame(
                        rows,
                        columns=["event_type", "period", "n", "s_stat", "alarm"],
                    )
                )
        state.update((cur_p, cur_n, s))
        yield from out

    result = (
        stream.groupBy("event_type")
        .applyInPandasWithState(
            cusum,
            outputStructType=(
                "event_type STRING, period LONG, n LONG, s_stat LONG, alarm BOOLEAN"
            ),
            stateStructType="cur_p LONG, cur_n LONG, s LONG",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = f"cusum_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    q = (
        result.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"availableNow drain did not finish within {timeout_s}s")
    return spark.table(sink)


def stream_cusum_batch_sql(period_s: int = 3600, k: int = 80, h: int = 200) -> str:
    """Batch oracle of :func:`stream_cusum` (DuckDB): closed-form
    S_t = cum_t − min(0, running-min cum) over observed periods, excluding
    each type's final period."""
    return f"""
WITH px AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // {period_s} AS period,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
c1 AS (
  SELECT event_type, period, n,
         sum(n - {k}) OVER (PARTITION BY event_type ORDER BY period
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         max(period) OVER (PARTITION BY event_type) AS p_last
  FROM px),
cum AS (
  SELECT event_type, period, n, cum, p_last,
         min(cum) OVER (PARTITION BY event_type ORDER BY period
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mincum
  FROM c1)
SELECT event_type, period, n,
       CAST(cum - least(0, mincum) AS BIGINT) AS s_stat,
       (cum - least(0, mincum)) > {h} AS alarm
FROM cum WHERE period < p_last
"""
