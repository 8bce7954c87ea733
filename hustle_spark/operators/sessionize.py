"""Batch sessionization — assign session ids from inactivity gaps.

EXT operator (the reference has no session concept). The classic
composition: ``lag(ts)`` per key, mark a new session when the gap
exceeds the threshold, running-sum the markers. Two window passes over
one shuffle by key — no UDFs, stays in whole-stage codegen, scales
linearly. The streaming twin is ``F.session_window`` (see
``hustle_spark.streaming``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..util import interval_seconds


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Add ``session_col``: 1-based session index per key, new session
    when the gap since the previous event exceeds ``gap``."""
    gap_seconds = F.lit(interval_seconds(gap))
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev_ts = F.lag(F.col(ts)).over(w)
    is_new = (
        prev_ts.isNull()
        | ((F.col(ts).cast("double") - prev_ts.cast("double")) > gap_seconds)
    ).cast("long")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(session_col, F.sum(is_new).over(wsum))


def session_stats(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-key session counts (n_sessions, n_events) — the aggregate
    form used by the oracle-checked query."""
    s = sessionize(df, key, ts, gap)
    return s.groupBy(key).agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )
