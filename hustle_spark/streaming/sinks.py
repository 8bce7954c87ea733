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
