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
