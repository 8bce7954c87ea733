"""Content-addressed sharded export — the delivery format of a
training-data build: N stable shards, each a self-contained parquet
dir, plus a manifest the consumer can verify without re-reading the
corpus.

Shard assignment is a pure function of the ROW ID (md5-hex-pair mod
n_shards), never of partitioning or row order, so re-running the
export on differently-partitioned input produces byte-identical shard
membership — the property that makes incremental re-delivery and
cross-run diffing possible. With n_shards <= 256 the assignment is
also exactly replayable by any engine that can read two hex nibbles
(the repo's stratified-sampling idiom).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_pack_out_dir(out_dir: str | Path, suffix: str) -> None:
    """Precondition for the streaming container packers (ADVICE r11):
    refuse an ``out_dir`` that already holds finished ``shard-*``
    files of this container type — a re-pack with a different derived
    n_shards would otherwise leave stale shards that a binaryFile
    glob re-read silently MIXES with fresh ones (the staged requery
    rows guard with rmtree; the API itself must not depend on that).
    Leftover ``shard-*<suffix>.tmp`` files from an aborted earlier run
    of THIS container type are orphans by construction (the
    atomic-rename contract means no reader ever saw them) and are
    removed here so retries start clean. Only this pack's own naming
    pattern is swept (review finding r12): a blanket ``*.tmp`` unlink
    would delete the live in-flight files of a concurrent pack of the
    OTHER container type sharing the directory — making ITS
    os.replace fail mid-write — plus any unrelated user file that
    happens to end in .tmp. Two concurrent packs of the SAME type
    into one directory remain the caller's race to avoid, exactly
    like two writers to one path anywhere else."""
    import os

    p = Path(out_dir)
    if not p.is_dir():
        return
    stale = []
    for name in os.listdir(p):
        if name.startswith("shard-") and name.endswith(suffix):
            stale.append(name)
        elif name.startswith("shard-") and name.endswith(suffix + ".tmp"):
            (p / name).unlink()  # orphaned by the atomic-rename contract
    if stale:
        raise ValueError(
            f"out_dir {out_dir!r} already contains {len(stale)} "
            f"shard-*{suffix} file(s) (e.g. {sorted(stale)[0]!r}); a "
            "re-pack with a different derived n_shards would leave "
            "stale shards a glob re-read silently mixes in — clear "
            "the directory (or pick a fresh one) before packing"
        )


def shard_of(id_col, n_shards: int = 16, salt: str = "shard"):
    """Shard id (0..n_shards-1) from the first hex byte of
    md5('<id>:<salt>') — deterministic, partitioning-independent,
    engine-replayable. n_shards must divide into 256 assignments
    sensibly; values above 256 raise (use two bytes if ever needed)."""
    if not 1 <= n_shards <= 256:
        raise ValueError(f"n_shards must be in [1, 256], got {n_shards}")
    hexpair = F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit(":" + salt))), 1, 2
    )
    return (F.conv(hexpair, 16, 10).cast("int") % n_shards).alias("shard")


def write_sharded(
    df: DataFrame,
    out_dir: str | Path,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Write ``df`` as ``shard=K/`` parquet dirs plus a
    ``_manifest`` parquet of per-shard (shard, n_rows, sum_ids) —
    integer integrity fields a consumer (or a DuckDB oracle) can
    recompute from the shard contents alone. Returns the manifest
    DataFrame (re-read from disk, so what you get is what landed).

    Scale shape: ONE pass — the shard column is computed map-side and
    ``partitionBy`` splits the write; the manifest is a bounded
    (n_shards-row) aggregate. No repartition() is forced: each input
    partition writes into the shard dirs it touches, trading file
    count for zero shuffle (compact() merges small files downstream if
    needed — the catalog's documented small-file policy)."""
    out = str(out_dir)
    sharded = df.withColumn("shard", shard_of(F.col(id_col), n_shards, salt))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out)
    # explicit schemas on both read-backs: an EMPTY export writes only
    # _SUCCESS (no part files), where schema inference would throw —
    # the repo's pinned empty-input convention returns an empty
    # manifest instead
    back = df.sparkSession.read.schema(sharded.schema).parquet(out)
    manifest = (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(id_col).cast("bigint").alias("sum_ids"),
        )
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{out}/_manifest")
    return df.sparkSession.read.schema(
        "shard int, n_rows bigint, sum_ids bigint"
    ).parquet(f"{out}/_manifest")
