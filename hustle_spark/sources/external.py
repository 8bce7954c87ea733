"""External connectors that need artifacts absent from this container
(Kafka client jars, Delta/Iceberg jars). The wiring is real — options,
schemas, watermark handling — gated behind availability checks so the
engine degrades with a precise error instead of a Spark classpath
stack trace. On a cluster with the jars present these functions work
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ConnectorUnavailable(RuntimeError):
    pass


def _has_class(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema: T.StructType,
    starting_offsets: str = "latest",
    ts_field: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming Kafka source -> parsed event columns.

    The production ingress for the events table: JSON values parsed
    with the declared schema (undeclared fields dropped — hustle insert
    semantics), Kafka timestamp kept as ``kafka_ts`` for lag tracking.
    A watermark is applied on ``ts_field`` when that column exists in
    the declared schema (``watermark=None`` disables) — without it,
    append-mode windowed aggregation downstream is rejected outright
    and update-mode state grows unbounded.
    """
    if not _has_class(spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"):
        raise ConnectorUnavailable(
            "Kafka connector jars not on the classpath (expected "
            "spark-sql-kafka-0-10). Add the package on a real cluster; "
            "this container intentionally has no broker or client jars."
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
    )
    out = parsed.select("kafka_ts", "v.*")
    if watermark is not None and ts_field in value_schema.fieldNames():
        out = out.withWatermark(ts_field, watermark)
    return out


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Delta-format table write (ACID append/overwrite/merge source)."""
    spark = df.sparkSession
    if not _has_class(spark, "org.apache.spark.sql.delta.catalog.DeltaCatalog"):
        raise ConnectorUnavailable(
            "Delta Lake jars not on the classpath (expected delta-spark). "
            "In this container use parquet + the catalog's partition "
            "lifecycle instead; the write below runs unchanged once the "
            "jars are present."
        )
    writer = df.write.format("delta").mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


_AVRO_CLS = "org.apache.spark.sql.avro.AvroFileFormat"


def read_avro(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Avro scan — the third columnar-ish interchange format after
    parquet/ORC (row-oriented storage, schema'd; the standard Kafka /
    data-exchange container). Spark ships Avro as an EXTERNAL module
    (spark-avro), absent from this container — gate like Kafka/Delta:
    precise error here, works unchanged with the package deployed."""
    if not _has_class(spark, _AVRO_CLS):
        raise ConnectorUnavailable(
            "Avro datasource module not on the classpath (expected "
            "spark-avro; the avro core jars alone are not the data "
            "source). Add the package on a real cluster; use "
            "parquet/ORC/JSONL in this container."
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format("avro").load(path)


def write_avro(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Avro sink (gated like read_avro)."""
    if not _has_class(df.sparkSession, _AVRO_CLS):
        raise ConnectorUnavailable(
            "Avro datasource module not on the classpath (expected "
            "spark-avro). Add the package on a real cluster."
        )
    writer = df.write.format("avro").mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def connector_status(spark: SparkSession) -> dict[str, bool]:
    """Availability report for optional connectors."""
    return {
        "kafka": _has_class(spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"),
        "delta": _has_class(spark, "org.apache.spark.sql.delta.catalog.DeltaCatalog"),
        "iceberg": _has_class(spark, "org.apache.iceberg.spark.SparkCatalog"),
        "avro": _has_class(spark, _AVRO_CLS),
    }
