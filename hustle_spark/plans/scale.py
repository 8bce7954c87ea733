"""Scale hardening: the 100 TB design pass (SURVEY.md section 7.7).

The reference ran one marble per task with no skew handling, no
spill-awareness and no plan feedback (public repo:
``hustle/core/pipeline.py`` — fixed one-shot physical plans). On Spark
most of that hardening is configuration + a few composable helpers:

- ``scale_configs``: the conf set a 1000-executor deployment starts
  from — AQE (runtime coalescing, skew-join splitting, join-strategy
  demotion), partition-size targets so a task's working set fits in
  executor memory, zstd shuffle compression.
- ``salted_join``: explicit key salting for joins whose *build side*
  must shuffle and whose key histogram is pathological beyond what AQE
  skew-split handles (e.g. a single key holding >10% of rows).
- ``bucketize_table``: co-locate repeated join keys at write time so
  later joins on that key skip the shuffle entirely.
- ``audit_plan``: assert the physical plan has the properties every
  operator here is designed for (pushdown reached the scan, projection
  pruned, no accidental cartesian products).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scale_configs(target_partition_mb: int = 128, cores: int = 2000) -> dict[str, str]:
    """Baseline conf for a large deployment. ``cores`` = total executor
    cores; shuffle partitions start at ~2x cores and AQE coalesces
    downward per stage."""
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": f"{target_partition_mb * 2}m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": f"{target_partition_mb}m",
        "spark.sql.shuffle.partitions": str(cores * 2),
        "spark.sql.files.maxPartitionBytes": f"{target_partition_mb}m",
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.shuffle.compress": "true",
        "spark.io.compression.codec": "zstd",
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.filterPushdown": "true",
        # runtime bloom-filter join pruning: the non-partitioned
        # sibling of dynamic partition pruning — a selective build side
        # injects a bloom filter into the probe side's scan, cutting
        # the big table's shuffle input before the join. On by default
        # in Spark 4 but pinned here so a cluster-level override can't
        # silently lose it at 100 TB, where it is a first-order win.
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    }


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key into ``salt``
    sub-keys and replicate the small side per salt value, so one hot key
    spreads over ``salt`` tasks instead of melting one executor.

    Use when AQE skew-split is insufficient (a single key >> one
    partition) — e.g. the null-user or bot-traffic key in event data.
    Replication cost: small side x salt, so keep the small side small
    or the salt modest.

    ``how`` is restricted to inner/left/left_outer/left_semi: the
    explode trick replicates every small-side row ``salt`` times, and
    under right/full-outer semantics the copies that miss the big
    side's randomly-assigned salt would SURVIVE as spurious null-big
    output rows (salt-1 extras per unmatched small row). Those joins
    need a different skew strategy; refusing beats returning wrong
    rows.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi joins, not {how!r}: "
            "replicated small-side rows would surface as spurious "
            "outer-null output under right/full semantics"
        )
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    exploded_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_big.join(exploded_small, [key, "__salt"], how)
    return out.drop("__salt")


def bucketize_table(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int = 64,
    path: str | None = None,
) -> None:
    """Write ``df`` bucketed by ``key``: subsequent joins/aggs on
    ``key`` between tables bucketed the same way need no shuffle
    (Spark's analogue of hustle keeping marbles pre-partitioned by
    insert batch — but keyed, which hustle could not do)."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def audit_plan(
    df: DataFrame,
    expect_pushed: list[str] | None = None,
    max_read_columns: int | None = None,
    forbid_cartesian: bool = True,
    forbid_python_udf: bool = False,
) -> list[str]:
    """Return a list of violations of scale invariants (empty = clean).

    - ``expect_pushed``: column names that must appear in PushedFilters
      (predicate reached the parquet scan).
    - ``max_read_columns``: ReadSchema must not exceed this width
      (projection pruning happened).
    - ``forbid_cartesian``: no CartesianProduct/BroadcastNestedLoopJoin
      unless explicitly allowed (exact small-query-set similarity
      legitimately broadcasts, so callers opt out there).
    - ``forbid_python_udf``: no BatchEvalPython in the hot path.
    """
    plan = explain_str(df)
    violations: list[str] = []
    if expect_pushed:
        pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
        for col in expect_pushed:
            # word-boundary match: a pushed filter on 'events_ts' must
            # NOT satisfy an expectation on 'ts'
            if not re.search(rf"\b{re.escape(col)}\b", pushed):
                violations.append(f"filter on {col!r} not pushed to scan")
    if max_read_columns is not None:
        for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
            width = len([c for c in m.split(",") if c])
            if width > max_read_columns:
                violations.append(f"scan reads {width} columns (max {max_read_columns})")
    if forbid_cartesian and ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan):
        violations.append("plan contains a cartesian/nested-loop join")
    if forbid_python_udf and ("BatchEvalPython" in plan or "ArrowEvalPython" in plan):
        violations.append("plan contains a Python UDF in the hot path")
    return violations


def apply_scale_configs(spark: SparkSession, **kwargs) -> None:
    for k, v in scale_configs(**kwargs).items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session; next session picks it up
