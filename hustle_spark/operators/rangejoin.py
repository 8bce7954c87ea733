"""Range join — pair rows whose event times fall within a window of
each other (EXT; the reference had only equi-joins).

Scale design: a naive time-range join is an inequality join, which
Spark plans as BroadcastNestedLoopJoin — O(n*m). Instead we bucketize
time into ``width``-sized buckets (width = the range span), explode the
left side into the two or three buckets its window can touch, and
equi-join on (key, bucket) before the exact filter. Candidates per row
are bounded by bucket occupancy, the join is a plain hash join, and
AQE handles skewed buckets. This is the standard interval-join
decomposition used by Flink's interval join and Spark's own
session-window implementation.

Semantics note: the window test uses *floor-epoch-second* arithmetic
(integers), making results exactly reproducible across engines and
immune to sub-second precision differences between storage (ns) and
session (us) timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import interval_seconds


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str = "-5 minutes",
    upper: str = "5 minutes",
    suffix: str = "_r",
) -> DataFrame:
    """Rows (l, r) with equal ``on`` keys and
    ``epoch_s(l.left_ts) + lower <= epoch_s(r.right_ts) <= epoch_s(l.left_ts) + upper``.

    ``lower``/``upper`` are interval strings; prefix with ``-`` for
    negative bounds. Right columns are suffixed on name collision.
    """
    lo = _signed_seconds(lower)
    hi = _signed_seconds(upper)
    if lo > hi:
        raise ValueError(f"lower bound {lower!r} exceeds upper bound {upper!r}")
    width = max(int(hi - lo), 1)

    l_epoch = F.floor(F.col(left_ts).cast("double")).cast("long")

    renames = {
        c: c + suffix for c in right.columns if c in left.columns and c != on
    }
    r_named = right
    for old, new in renames.items():
        r_named = r_named.withColumnRenamed(old, new)
    r_ts_name = renames.get(right_ts, right_ts)
    r_epoch = F.floor(F.col(r_ts_name).cast("double")).cast("long")

    # left window [e+lo, e+hi] can touch buckets floor((e+lo)/w)..floor((e+hi)/w)
    lb = F.floor((l_epoch + F.lit(lo)) / width).cast("long")
    ub = F.floor((l_epoch + F.lit(hi)) / width).cast("long")
    l_exp = left.withColumn("__e", l_epoch).withColumn(
        "__bucket", F.explode(F.sequence(lb, ub))
    )
    r_b = r_named.withColumn("__re", r_epoch).withColumn(
        "__bucket", F.floor(F.col("__re") / width).cast("long")
    )
    joined = l_exp.join(r_b, [on, "__bucket"])
    exact = joined.filter(
        (F.col("__re") >= F.col("__e") + F.lit(lo))
        & (F.col("__re") <= F.col("__e") + F.lit(hi))
    )
    return exact.drop("__bucket", "__e", "__re")


def _signed_seconds(spec: str) -> float:
    s = spec.strip()
    if s.startswith("-"):
        return -interval_seconds(s[1:])
    return interval_seconds(s)
