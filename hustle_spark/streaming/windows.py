"""Structured Streaming surface over the events table (EXT — the
reference is batch-append only; SURVEY.md section 2.8).

Design: every streaming aggregation here has a *batch twin* built from
the same column expressions, so the DuckDB oracle can check the
streaming semantics on static data. The streaming runner uses the
parquet file source + memory sink + ``processAllAvailable`` — on a
real cluster the source becomes Kafka and the sink a Delta/parquet
``foreachBatch``, with the query untouched.

Watermarks bound state: late events beyond the watermark are dropped
instead of growing executor state without bound — mandatory at any
real scale.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos-as-long (see catalog)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events.parquet`` as a bounded stream (file source), whether it
    is a single file (the testdata layout) or a directory of part files
    (any Spark-written copy). The timestamp physical type is probed
    from the parquet footer via the batch reader: TIMESTAMP(NANOS)
    files are read as long and converted exactly like the batch catalog
    path, plain TIMESTAMP(MICROS) files are read natively — either way
    batch and stream agree to the microsecond."""
    from pathlib import Path

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    ts_type = dict(spark.read.parquet(path).dtypes)["ts"]

    def _source(schema: T.StructType) -> DataFrame:
        # the file stream source rejects a bare file path ("basePath
        # must be a directory"), so a single-file layout streams via
        # parent dir + glob filter; a directory streams directly
        if Path(path).is_file():
            return (
                spark.readStream.schema(schema)
                .option("pathGlobFilter", "events.parquet")
                .parquet(sf_dir)
            )
        return spark.readStream.schema(schema).parquet(path)

    if ts_type == "bigint":  # nanos-as-long footer
        raw = _source(EVENTS_RAW_SCHEMA)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    micros_schema = T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", T.TimestampType())
            for f in EVENTS_RAW_SCHEMA.fields
        ]
    )
    return _source(micros_schema)


def tumbling_window_agg(events: DataFrame, size: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    w = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        w.groupBy(F.window("ts", size).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame, size: str = "2 hours", slide: str = "1 hour", watermark: str = "4 hours"
) -> DataFrame:
    w = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        w.groupBy(F.window("ts", size, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp(F.col("win.start")).alias("window_start"), "n")
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    w = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        w.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("win.start")).alias("session_start"),
            "n_events",
        )
    )


def streaming_dedupe(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exact dedupe by event_id with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stream_stream_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with a time-range condition: each
    purchase is matched to the same user's clicks in the preceding
    ``lookback`` window (inclusive both ends) — the classic streaming
    attribution join.

    State bounding at scale: BOTH sides carry a watermark and the join
    condition bounds event time on both sides, so Spark can evict join
    state as the watermark advances — without the range bound the click
    buffer would grow forever. Output mode must be append (stream-stream
    joins emit no retractions).

    Inputs must already be projected to (click_id, c_ts, user_id) and
    (purchase_id, p_ts, p_user_id) — distinct names keep the join
    output unambiguous.
    """
    c = clicks.withWatermark("c_ts", watermark) if clicks.isStreaming else clicks
    p = purchases.withWatermark("p_ts", watermark) if purchases.isStreaming else purchases
    return c.join(
        p,
        F.expr(
            f"user_id = p_user_id AND "
            f"c_ts BETWEEN p_ts - INTERVAL {lookback} AND p_ts"
        ),
    )


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    size: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STATIC join + watermarked tumbling aggregate: the classic
    dimension-enrichment shape. The static side is re-planned as a
    broadcast lookup each micro-batch — no join state accumulates (only
    stream-stream joins buffer state), so the dimension can be swapped
    between batches and the stream side stays the only unbounded input.
    ``dim`` must carry (event_type, weight).

    Output-mode caveat (ADVICE r3): in ``complete`` mode Spark retains
    EVERY window group forever — the watermark is ignored for state
    eviction, which is fine for the bounded availableNow test runs this
    repo drives but wrong guidance for production. An unbounded
    deployment must run ``append`` (or ``update``) mode, where the
    watermark actually evicts closed windows."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    j = e.join(F.broadcast(dim), "event_type")
    return (
        j.groupBy(F.window("ts", size).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(
                F.sum(F.col("value").cast("decimal(18,2)") * F.col("weight")).cast(
                    "double"
                )
                * 100
            )
            .cast("bigint")
            .alias("weighted_value_c"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start"),
            "event_type",
            "n",
            "weighted_value_c",
        )
    )


def run_streaming_batch(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Drive a (bounded) streaming DataFrame to completion through a
    memory sink and return the result as a static DataFrame. This is how
    the oracle checks streaming queries: same expressions, real
    micro-batch execution."""
    import shutil
    from pathlib import Path

    name = f"hs_stream_{uuid.uuid4().hex[:8]}"
    # parquet scratch sink, NOT a memory sink: a memory sink holds the
    # ENTIRE result driver-resident (ruinous for append-mode
    # stream-stream joins whose raw output is pair-level and unbounded);
    # foreachBatch-to-parquet keeps every row executor-side and the
    # returned DataFrame is an ordinary distributed scan
    out_dir = Path("/root/repo/.scratch/stream_runs") / name
    shutil.rmtree(out_dir, ignore_errors=True)
    spark = stream_df.sparkSession
    schema = stream_df.schema

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode(
            "overwrite" if output_mode == "complete" else "append"
        ).parquet(str(out_dir / "data") if output_mode == "complete"
                  else str(out_dir / f"data/epoch={epoch_id}"))

    q = (
        stream_df.writeStream.outputMode(output_mode)
        .foreachBatch(write_batch)
        .option("checkpointLocation", str(out_dir / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(300)
    finally:
        if q.isActive:
            q.stop()
    if not finished:
        # returning a partially-committed sink would hand the caller a
        # silently truncated "result"
        raise TimeoutError(
            f"streaming query {name} did not finish within 300s"
        )
    data = out_dir / "data"
    if not data.exists():
        return spark.createDataFrame([], schema)
    out = spark.read.schema(schema).parquet(str(data))
    if "epoch" in out.columns and "epoch" not in schema.fieldNames():
        out = out.drop("epoch")
    return out
