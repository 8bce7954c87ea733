"""Streaming sinks (SURVEY.md section 2.8): exactly-once parquet via
foreachBatch, the production sink pattern when the target is a plain
table rather than a streaming-native store.

foreachBatch hands each micro-batch to ordinary batch code with an
epoch id; idempotent overwrite-by-epoch-partition gives effective
exactly-once on top of the checkpointed source offsets. On a cluster
the checkpoint dir lives on HDFS/S3; the batch writer is the same
catalog append used everywhere else.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame


def foreach_batch_parquet(
    stream_df: DataFrame,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
    mode: str = "epoch-partitioned",
):
    """Start a foreachBatch parquet writer; returns the StreamingQuery.

    ``epoch-partitioned``: each micro-batch lands in ``epoch=<id>/`` via
    dynamic partition overwrite — re-delivered batches overwrite their
    own partition instead of duplicating (idempotence = exactly-once).
    """
    out = str(out_dir)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # one subdir per epoch, overwritten on redelivery: idempotent
        batch_df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_ingest_dedup(
    stream_df: DataFrame,
    out_dir: str | Path,
    index_dir: str | Path,
    checkpoint_dir: str | Path,
    id_col: str = "doc_id",
    text: str = "text",
):
    """Continuous-ingestion exact dedup: each micro-batch is
    (1) deduped WITHIN the batch by content digest (keep min id —
    deterministic under redelivery), (2) anti-joined against the
    persistent DIGEST INDEX (parquet, ~32 B/doc — the corpus itself is
    never re-read), and (3) survivors land in ``epoch=<id>/`` under
    both the output and the index via dynamic-partition-style epoch
    overwrite, so a redelivered batch rewrites its own partitions
    instead of duplicating — the streaming twin of the batch
    ``dedup_incremental`` registry query. Returns the StreamingQuery.

    Scale shape: the index side of the anti-join carries ONLY digests;
    Spark broadcasts the batch side when small. State lives entirely
    in parquet (restart-safe beyond what in-memory streaming state
    gives); the checkpoint makes batch ids stable across retries so
    the epoch overwrite is idempotent.

    Caveat (same class as the stream_static_enrich note): batches in
    the SAME run see the index as of their own start; two copies of a
    doc arriving in one batch are collapsed by step (1), and across
    batches by step (2) — but an exactly-simultaneous duplicate in two
    concurrently-committing epochs would need a serializable target
    table (Delta/Iceberg) for the final word. availableNow processing
    is sequential, so the tests pin the sequential semantics.
    """
    from pyspark.sql import functions as F

    out = str(out_dir)
    idx = str(index_dir)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        digest = F.md5(F.col(text))
        batch = batch_df.withColumn("__digest", digest)
        # within-batch keep-min (deterministic across redeliveries)
        from pyspark.sql import Window

        w = Window.partitionBy("__digest").orderBy(F.col(id_col).asc())
        batch = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # existence via Hadoop FS (works on HDFS/S3 too; quieter than
        # letting the read throw on the very first epoch)
        jpath = spark._jvm.org.apache.hadoop.fs.Path(idx)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            seen = spark.read.parquet(idx)
            # CRITICAL redelivery guard: a crashed attempt of THIS epoch
            # may already have written index/epoch=<id>; seeing our own
            # digests would anti-join the whole redelivered batch away.
            # Excluding our epoch partition reconstructs exactly the
            # index state the first attempt saw (availableNow epochs
            # are sequential).
            if "epoch" in seen.columns:
                seen = seen.filter(F.col("epoch") != epoch_id)
            seen = seen.select("__digest").distinct()
            fresh = batch.join(seen, "__digest", "left_anti")
        else:
            fresh = batch  # first epoch: no index yet
        # two actions follow (output + index): persist so the batch
        # scan, keep-min window, index read, and anti-join run ONCE per
        # micro-batch, not twice
        fresh = fresh.persist()
        try:
            fresh.drop("__digest").write.mode("overwrite").parquet(
                f"{out}/epoch={epoch_id}"
            )
            fresh.select("__digest").write.mode("overwrite").parquet(
                f"{idx}/epoch={epoch_id}"
            )
        finally:
            fresh.unpersist()

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )
