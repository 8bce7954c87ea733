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
