"""As-of join — match each left row with the most recent right row.

The reference has no such operator (hustle joins are two-table inner
equi-joins only — public repo ``hustle/core/pipeline.py``); this is a
north-star EXT operator for event-stream analytics.

Scale design: the naive formulation is an inequality join
(``l.ts >= r.ts``) which Spark executes as a broadcast nested loop —
O(n*m), hopeless at 100 TB. Instead we use the union-and-carry-forward
pattern: union both sides tagged by origin, sort within ``on``-key
partitions by time, and carry the last right-side row forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.
Cost: ONE shuffle by the key (same as any equi-join), no cross
product, arbitrarily large sides. Skewed keys are handled by AQE; the
window is computed within key partitions so state never exceeds a
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each ``left`` row, attach the latest ``right`` row with
    ``right_ts <= left_ts`` (direction='backward'; 'forward' matches the
    earliest ``right_ts >= left_ts``), matching on equality of ``on``.

    ``right_cols``: right columns to carry (default: all but key/ts).
    ``tolerance``: optional max age like ``'30 minutes'`` — matches
    older than the tolerance become NULL.

    A carried right column whose name collides with a left column is
    suffixed ``_r`` in the output (the range_join convention) — both
    copies stay addressable instead of producing an ambiguous
    duplicate name.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    carried = [f"__r_{c}" for c in right_cols]
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in (on,)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(rc) for c, rc in zip(right_cols, carried)],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on,)],
        *[F.col(c).alias(rc) for c, rc in zip(right_cols, carried)],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort before left rows at equal ts => a right row at
    # exactly left_ts matches (<= / >= semantics, like pandas
    # merge_asof); only the time direction differs between modes
    order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fill = F.last

    filled = unioned.select(
        "*",
        *[fill(rc, ignorenulls=True).over(w).alias(f"__f_{rc}") for rc in carried + ["__r_ts"]],
    )
    out = filled.filter(F.col("__is_left") == 1)

    matched_ts = F.col("__f___r_ts")
    if tolerance is not None:
        from ..util import interval_seconds

        delta = F.col("__ts").cast("double") - matched_ts.cast("double")
        if direction == "forward":
            delta = -delta
        keep = delta <= F.lit(interval_seconds(tolerance))
    else:
        keep = F.lit(True)

    selects = [F.col("__k").alias(on), F.col("__ts").alias(left_ts)]
    selects += [F.col(c) for c in left.columns if c not in (on, left_ts)]
    left_names = set(left.columns)
    for c, rc in zip(right_cols, carried):
        out_name = c + "_r" if c in left_names else c
        selects.append(F.when(keep, F.col(f"__f_{rc}")).alias(out_name))
    selects.append(F.when(keep, matched_ts).alias(f"{right_ts}_matched"))
    return out.select(*selects)
