"""Mergeable frequency sketches — count–min (north-star EXT; the
frequency twin of the HLL rollup row, SURVEY.md §2.10 L49).

Public-knowledge provenance: Cormode & Muthukrishnan 2005, "An
improved data stream summary: the count-min sketch and its
applications" (J. Algorithms 55) — the standard depth×width counter
array with per-row pairwise hashing; point estimate = min over rows;
never underestimates; mergeable by cell-wise addition.

Why build it from DataFrame ops instead of Spark's
``F.count_min_sketch`` aggregate: the built-in returns an opaque
serialized blob with NO SQL-side point-query function, so its
estimates can't be read back in a query, let alone replayed by the
DuckDB oracle. Expressed as a (d, bucket, cnt) cell FRAME the sketch
is exactly as mergeable (cell-wise SUM — proven executable below via
per-day partials), the estimate is an equi-join + MIN, and every
number replays bit-for-bit cross-engine because the row hashes are
md5-derived (the dedup_minhash_md5 / write_sharded idiom: first 8 hex
chars parsed base-16, identical in Spark ``conv`` and DuckDB's
``('0x' || …)::BIGINT`` cast — parity pinned in tests).

100 TB shape: the sketch is at most depth×width cells (the registry
caller uses 4×256 = 1024 rows — KBs) produced by ONE map-side-combined
groupBy over the stream; per-day partial sketches merge by cell-wise sum without
re-touching events (the HLL-rollup incremental pattern, but for
frequencies); estimates broadcast the cell frame against any
candidate-key set. Nothing in the flow scales with the number of
distinct keys except the candidate set the caller supplies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_bucket(key_str: Column, d: Column, width: int) -> Column:
    """Row-``d`` bucket of a string key: first 8 md5 hex chars of
    ``key:d`` parsed base-16, mod width. 32-bit value — positive in
    every engine, so ``%`` has no sign hazard."""
    salted = F.concat(key_str, F.lit(":"), d.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("bigint")
        % F.lit(width)
    ).alias("bucket")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    partial_by: Column | None = None,
) -> DataFrame:
    """Count–min sketch over ``key_col``: a (d, bucket, cnt) cell frame
    with at most depth×width rows.

    ``partial_by`` (e.g. an epoch-day expression) routes the build
    through per-group PARTIAL sketches merged by cell-wise sum — the
    incremental production shape. Counter addition commutes, so the
    merged frame is value-identical to the direct build (the DuckDB
    oracle replays the direct form); a NULL group key just becomes one
    more partial and merges the same way.

    NULL keys are the caller's contract to exclude (a NULL key would
    hash as the literal absence, not a value — the same reason the
    HLL row filters NULL ts).
    """
    if partial_by is not None:
        keys = df.select(
            F.col(key_col).cast("string").alias("__k"),
            partial_by.alias("__part"),
        )
    else:
        keys = df.select(F.col(key_col).cast("string").alias("__k"))
    exploded = keys.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    cells = exploded.select(
        *(["__part"] if partial_by is not None else []),
        "d",
        _md5_bucket(F.col("__k"), F.col("d"), width),
    )
    if partial_by is not None:
        partials = cells.groupBy("__part", "d", "bucket").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return partials.groupBy("d", "bucket").agg(
            F.sum("cnt").alias("cnt")
        )
    return cells.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point estimates for a candidate-key frame against a sketch:
    ``est_cnt(k) = min over d of cell(d, bucket_d(k))``, the classic
    CM estimate — deterministic for fixed input, and never below the
    true count (0 for unseen keys). The sketch side is broadcast
    (≤ depth×width rows). The left join's coalesce makes an ABSENT
    cell count as the 0 it is — an unseen key whose buckets all
    collide with seen keys still gets the standard CM overestimate,
    exactly as the structure defines it."""
    kd = keys.select(
        F.col(key_col), F.col(key_col).cast("string").alias("__k")
    ).select(
        key_col,
        "__k",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select(
        key_col, "d", _md5_bucket(F.col("__k"), F.col("d"), width)
    )
    joined = kd.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias(
            "est_cnt"
        )
    )
