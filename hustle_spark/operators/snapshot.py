"""Corpus snapshot diffing — the dataset-versioning primitive a
training-data pipeline runs between two builds of the same corpus:
which documents were added, removed, changed, or untouched, computed
by content digest so a re-crawl that rewrites identical bytes is
"unchanged", not "changed".

Scale shape: each side is reduced map-side to (id, md5(text)) — 48
bytes/row — before the one full-outer shuffle; document text never
moves. At 100 TB the diff costs two column-pruned scans plus a
digest-keyed join, and the summary is a 4-row aggregate of that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-document diff between two corpus versions: returns
    (id_col, status) with status in {added, removed, changed,
    unchanged}. ``added`` = id only in ``new``; ``removed`` = id only
    in ``old``; otherwise digest equality decides. Deterministic and
    partitioning-independent (md5 of the text bytes, no floats)."""
    a = old.select(F.col(id_col), F.md5(F.col(text)).alias("__old_d"))
    b = new.select(F.col(id_col), F.md5(F.col(text)).alias("__new_d"))
    j = a.join(b, id_col, "full_outer")
    status = (
        F.when(F.col("__old_d").isNull(), F.lit("added"))
        .when(F.col("__new_d").isNull(), F.lit("removed"))
        .when(F.col("__old_d") == F.col("__new_d"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """The 4-row rollup of snapshot_diff: (status, n) — what a build
    report shows before anyone drills into per-doc rows."""
    return (
        snapshot_diff(old, new, id_col, text)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
