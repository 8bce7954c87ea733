"""Zero-extra-job pipeline accounting via ``DataFrame.observe``.

A 100 TB curation run cannot afford a ``count()`` per stage — each is a
full extra pass over the data. ``observe`` attaches named aggregate
metrics to the plan itself: the executors accumulate them while the ONE
real action runs (no shuffle, no second scan), and ``Observation.get``
returns them afterwards. This is how drop-rate auditing of a filter
chain stays free at scale.

Usage::

    from hustle_spark.plans.observe import audit_retention

    final, metrics = audit_retention(
        docs,
        [("lang_filter", lambda d: d.filter(d.lang == "en")),
         ("len_filter",  lambda d: d.filter(d.n_chars > 200))],
    )
    # metrics == {"lang_filter": {"n_rows": ...}, "len_filter": {...}}
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str, metrics: list[Column] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach named inline metrics to ``df``'s plan. Returns the
    observed frame (same rows) and the Observation; call ``obs.get``
    AFTER an action has materialized the frame."""
    obs = Observation(name)
    out = df.observe(obs, *(metrics or [F.count(F.lit(1)).alias("n_rows")]))
    return out, obs


def audit_retention(
    df: DataFrame,
    stages: list[tuple[str, Callable[[DataFrame], DataFrame]]],
    action: Callable[[DataFrame], None] | None = None,
) -> tuple[DataFrame, dict[str, dict]]:
    """Run a chain of named transformations with per-stage row
    accounting, all inside ONE action.

    ``stages``: ``[(name, fn)]`` applied in order; after each fn the
    surviving row count is observed inline. ``action`` materializes the
    final frame (default: noop-format write — full materialization,
    nothing persisted). Returns the final frame and
    ``{stage: {"n_rows": count}}``.
    """
    observations: list[tuple[str, Observation]] = []
    cur = df
    for name, fn in stages:
        cur, obs = observed(fn(cur), name)
        observations.append((name, obs))
    if action is None:
        cur.write.format("noop").mode("overwrite").save()
    else:
        action(cur)
    return cur, {name: obs.get for name, obs in observations}


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Single-pass column profiler: (col, n_rows, n_null, n_distinct,
    min_s, max_s) per requested column — the ANALYZE-style statistics a
    planner (or a human sizing partitions) wants before touching a new
    100 TB table.

    ONE aggregate job over ONE scan regardless of column count: all
    per-column aggregates ride the same partial/final hash aggregate
    (multi-distinct lowers to a single Expand), then the one result row
    is exploded into per-column rows driver-side-free. The naive
    per-column loop would be len(cols) full scans.

    min/max are computed on the NATIVE type (so numeric/timestamp
    ordering is correct), then rendered to string; timestamps use a
    fixed ``yyyy-MM-dd HH:mm:ss`` format to stay engine-portable.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        mn, mx = F.min(c), F.max(c)
        if dtypes[c].startswith("timestamp"):
            mn_s = F.date_format(mn, "yyyy-MM-dd HH:mm:ss")
            mx_s = F.date_format(mx, "yyyy-MM-dd HH:mm:ss")
        else:
            mn_s, mx_s = mn.cast("string"), mx.cast("string")
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            mn_s.alias(f"__mn_{c}"),
            mx_s.alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_s"),
                F.col(f"__mx_{c}").alias("max_s"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(structs).alias("p")).select("p.*")
