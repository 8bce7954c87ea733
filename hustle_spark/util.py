"""Small shared helpers."""

from __future__ import annotations

_UNIT_SECONDS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
    "week": 604800,
    "weeks": 604800,
}


def interval_seconds(spec: str) -> float:
    """``'30 minutes'`` -> 1800.0 (mirrors Spark interval grammar for the
    day-time units used by gaps/tolerances)."""
    parts = spec.strip().split()
    if len(parts) % 2 != 0 or not parts:
        raise ValueError(f"bad interval spec {spec!r}")
    total = 0.0
    for qty, unit in zip(parts[::2], parts[1::2]):
        if unit.lower() not in _UNIT_SECONDS:
            raise ValueError(f"unsupported interval unit {unit!r} in {spec!r}")
        total += float(qty) * _UNIT_SECONDS[unit.lower()]
    return total


# --- tracked caching ------------------------------------------------------
#
# Operators that reuse an intermediate frame in two plan branches (dedup
# signatures, q15's revenue view) cache it so one action computes it
# once. The JVM-side cache outlives the Python wrapper, so frames are
# tracked here and released explicitly (benchmarks call release_cached()
# between queries to keep storage flat). Strong refs on purpose.

_CACHED: list = []


def tracked_cache(df):
    df = df.cache()
    _CACHED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked frame; returns how many were released.
    Safe any time — Spark recomputes on next use."""
    n = 0
    while _CACHED:
        df = _CACHED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def spread_input(df, spark):
    """Repartition ``df`` to the session's core count ONLY when the
    source scan under-parallelizes (fewer splits than cores) — the
    single-split-testdata equalizer that becomes a NO-OP on real
    pre-parallel corpora, where an unconditional repartition would
    shuffle the whole input (text included) for nothing. Heavy
    map-side phases (explodes, Arrow signature/decode stages)
    otherwise run on one core per split regardless of cluster size;
    measured 2.1-3.6x at sf0.1 across the text/sketch queries. The
    partition probe converts the plan to an RDD (driver-side only, no
    job)."""
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
