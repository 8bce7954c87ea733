"""SparkSession construction tuned for the hustle-spark engine.

The reference (tspurway/hustle) ran queries as Disco pipeline jobs over
DDFS-replicated LMDB marbles (public repo: ``hustle/core/pipeline.py``).
Here the entire execution substrate is Spark: one ``SparkSession`` with
AQE enabled replaces the Disco master/worker machinery.

Scale notes (100 TB design pass, SURVEY.md section 7.7):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switching replace any hand-tuned stage
  sizing the reference did with per-marble granularity.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces. On a real cluster set it to ~2-3x total cores.
- Arrow enabled for any Pandas-UDF path (the slow path; hot paths stay
  in whole-stage codegen).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFIGS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet: vectorized reader + pushdown are on by default; keep
    # explicit so a misconfigured environment can't silently disable the
    # columnar fast path the whole engine design assumes.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Pinned session-wide: TIMESTAMP(NANOS) parquet columns read as
    # int64 instead of throwing in the vectorized reader; the catalog
    # converts them to TimestampType (micros) on read. Without the
    # engine, reading a nanos file is an error anyway, so the only
    # visible semantic change is error -> long column.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Engine convention is session-TZ TimestampType (with the UTC pin
    # above). Naive parquet micros (isAdjustedToUTC=false, the common
    # pyarrow/pandas output) would otherwise surface as TIMESTAMP_NTZ
    # under Spark 4 inference; reading them as LTZ directly avoids a
    # per-row NTZ->LTZ cast projection over every scan (the catalog
    # still normalizes via _ltz for foreign sessions missing this pin,
    # where the cast is value-identity at UTC).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def get_session(
    app_name: str = "hustle-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster, pass ``master=None`` and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if master.startswith("local") and not (extra_conf or {}).get("spark.driver.memory"):
        # local mode: the driver JVM IS the cluster; Spark's 1g default
        # OOMs on any serious sort/window, while huge heaps (16g+) cost
        # ~1s/query in G1 young-gen work on this box — 8g measured best.
        # Only effective when this call actually creates the JVM.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    for k, v in DEFAULT_CONFIGS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to a session we did not
    build (e.g. the correctness driver's). Only touches SQL confs that
    are safe to change mid-session; the session timezone pin is required
    for timestamp parity with the UTC-naive DuckDB oracle."""
    for k in (
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
    ):
        try:
            spark.conf.set(k, DEFAULT_CONFIGS.get(k, "true"))
        except Exception:
            pass  # conf locked by the host session; proceed with its value
    try:
        # a foreign session may carry Spark's 200 default — wrong for
        # local mode (AQE coalesces reads, but streaming state stores
        # are created per shuffle partition and never coalesced)
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            cores = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 4)))
    except Exception:
        pass
    return spark
