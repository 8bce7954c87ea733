"""Watermark semantics under real multi-batch streaming: late events
beyond the watermark are dropped from append-mode windowed aggregation.

Uses a monitored directory with two sequentially-added parquet files and
a persistent checkpoint so the query genuinely runs two micro-batch
rounds with watermark advancement in between — not a single-batch
simulation.
"""

import datetime as dt

from pyspark.sql import functions as F

RESULTS: list = []


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_late_rows_dropped_by_watermark(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    schema = "event_id long, ts timestamp, value double"
    RESULTS.clear()

    def run_round():
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_timestamp("win.start").alias("w"), "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda df, _eid: RESULTS.extend(tuple(r) for r in df.collect()))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish in 120s"

    spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:05:00"), 1.0),
            (2, ts("2024-01-01T10:20:00"), 1.0),
            (3, ts("2024-01-01T13:00:00"), 1.0),  # advances watermark to 12:00
        ],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    run_round()

    # round 2: an on-time row (13:10), a LATE row at 10:40 (watermark is
    # 12:00 — its window already closed), and 15:00 to flush 13:00's window
    spark.createDataFrame(
        [
            (4, ts("2024-01-01T13:10:00"), 1.0),
            (5, ts("2024-01-01T10:40:00"), 1.0),  # late: must be dropped
            (6, ts("2024-01-01T15:00:00"), 1.0),
        ],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    run_round()

    rows = dict(RESULTS)
    h10 = int(ts("2024-01-01T10:00:00").replace(tzinfo=dt.timezone.utc).timestamp())
    h13 = int(ts("2024-01-01T13:00:00").replace(tzinfo=dt.timezone.utc).timestamp())
    # 10:00 window emitted with ONLY the two on-time rows — the late
    # 10:40 event neither reopened nor inflated it
    assert rows.get(h10) == 2, f"10:00 window wrong: {RESULTS}"
    # 13:00 window (rows 3 and 4) emitted after 15:00 advanced the mark
    assert rows.get(h13) == 2, f"13:00 window wrong: {RESULTS}"


def test_unbounded_rate_source_through_window_agg(spark):
    """True UNBOUNDED source evidence: the built-in rate source (no
    connector jars needed) driven through the same watermark + tumbling
    window + memory sink stack the registry's file-source streaming
    queries use. Proves the streaming runner is not file-source-shaped:
    micro-batches arrive continuously and the aggregate keeps updating
    until we stop the query."""
    import time

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 200)
        .load()
    )
    agg = (
        stream.withWatermark("timestamp", "2 seconds")
        .groupBy(F.window("timestamp", "1 second"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rate_smoke")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = 0
        while time.time() < deadline:
            rows = spark.sql("SELECT count(*) FROM rate_smoke").collect()[0][0]
            if rows >= 2:  # at least two 1-second windows materialized
                break
            time.sleep(1)
        assert rows >= 2, f"rate stream produced only {rows} windows"
    finally:
        q.stop()


def test_streaming_ingest_dedup(spark, tmp_path):
    """Two-round availableNow drive of foreach_batch_ingest_dedup:
    within-batch dups collapse (keep-min), cross-batch dups are
    anti-joined out via the persistent digest index, and a re-run with
    a fresh checkpoint redelivers into the SAME epoch partitions
    idempotently (no duplication)."""
    from hustle_spark.streaming.sinks import foreach_batch_ingest_dedup

    src = tmp_path / "ingest_src"
    src.mkdir()
    out = tmp_path / "corpus"
    idx = tmp_path / "digest_index"
    ckpt = tmp_path / "ingest_ckpt"
    schema = "doc_id long, text string"

    def run_round(ckpt_dir):
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        q = foreach_batch_ingest_dedup(stream, out, idx, ckpt_dir)
        assert q.awaitTermination(120), "stream did not finish in 120s"

    # batch 1: 'alpha' duplicated within the batch (ids 1 and 2)
    spark.createDataFrame(
        [(1, "alpha"), (2, "alpha"), (3, "beta")], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    run_round(ckpt)

    kept1 = {(r.doc_id, r.text) for r in spark.read.parquet(str(out)).collect()}
    assert kept1 == {(1, "alpha"), (3, "beta")}  # keep-min within batch

    # batch 2: 'beta' duplicates batch 1 (dropped via index), 'gamma' is new
    spark.createDataFrame(
        [(4, "beta"), (5, "gamma")], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    run_round(ckpt)

    kept2 = {(r.doc_id, r.text) for r in spark.read.parquet(str(out)).collect()}
    assert kept2 == {(1, "alpha"), (3, "beta"), (5, "gamma")}
    # digest index holds exactly one digest per surviving doc
    assert spark.read.parquet(str(idx)).distinct().count() == 3

    # full redelivery with a FRESH checkpoint (all source files replayed
    # into new epochs): the own-epoch index exclusion keeps the corpus
    # CONTENT-identical — no doc duplicated, none lost
    run_round(tmp_path / "ingest_ckpt2")
    kept3 = {(r.doc_id, r.text) for r in spark.read.parquet(str(out)).collect()}
    assert kept3 == kept2
    # same-checkpoint rerun with no new files: zero new epochs, unchanged
    run_round(ckpt)
    assert {(r.doc_id, r.text) for r in spark.read.parquet(str(out)).collect()} == kept2
