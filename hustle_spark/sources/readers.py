"""Source connectors (SURVEY.md section 2.1).

The reference's only sources were DDFS marble scans and client-side
newline-JSON ingest (public repo: ``hustle/core/marble.py``
MarbleStream; ``hustle/__init__.py`` insert). Spark's DataSource V2
framework supplies the rest; these wrappers fix the engine conventions
(explicit schemas — never inference in production paths; nanos
handling; column-pruning-friendly layouts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ensure_declared_columns(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Add declared-but-absent columns as typed NULLs. The case this
    covers: a hive-partitioned export whose partition VALUES live in
    directory names — an EMPTY export has no part dirs, so the loaded
    frame silently lacks the partition column and downstream filters
    fail to resolve. Declared schema wins over what listing found —
    including COLUMN ORDER, so positional consumers see the same layout
    for empty and non-empty exports (partition discovery would otherwise
    place the column per Spark's rules)."""
    present = set(df.columns)
    for f in schema.fields:
        if f.name not in present:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    return df.select(*[f.name for f in schema.fields])


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan with pushdown — the marble-scan equivalent.
    Prefer :meth:`hustle_spark.Catalog.table`, which also handles
    TIMESTAMP(NANOS) and schema metadata."""
    return spark.read.parquet(path)


def read_json_events(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multiline: bool = False,
) -> DataFrame:
    """Newline-JSON with a declared schema: hustle-insert decode
    semantics (undeclared fields dropped, declared fields coerced,
    malformed rows null-filled — permissive mode)."""
    return (
        spark.read.schema(schema)
        .option("multiLine", multiline)
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .csv(path)
    )


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Opaque media payloads: (path, modificationTime, length, content)
    — feeds the multimodal operators. ``pathGlobFilter`` prunes at
    listing time, before any bytes are read."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan — the second columnar format besides parquet. Spark's
    native vectorized ORC reader gives the same pushdown/pruning
    behavior as parquet (PushedFilters + ReadSchema in the scan node),
    so ORC-resident tables are first-class engine inputs. Schema stays
    optional: ORC footers carry exact types, and unlike CSV/JSON there
    is no inference risk."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
        return _ensure_declared_columns(reader.orc(path), schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """ORC sink with zstd (matches the parquet sink's codec choice) and
    optional hive-style partitioning, so an ORC export remains
    partition-prunable when read back."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    delimiter: str = ",",
    compression: str = "gzip",
) -> None:
    """CSV sink (header + RFC-4180 quoting — Spark quotes any field
    containing the delimiter, which the round-trip row proves with a
    comma-bearing column). gzip keeps parity with the jsonl sink;
    note gzip CSV is NOT splittable, so a 100 TB export should use a
    splittable codec or many files (this writer emits one file per
    input partition, which is the many-files shape already)."""
    (
        df.write.mode(mode)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("compression", compression)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Newline-JSON scan. ALWAYS pass a schema in production: without
    one Spark runs a full inference pass (an extra read of the data)
    and silently widens mixed-type fields — at 100 TB the inference
    pass alone is the whole job's cost."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
        return _ensure_declared_columns(reader.json(path), schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "gzip",
) -> None:
    """Newline-JSON sink (the interchange format every downstream
    tokenizer/loader reads), gzip by default, optional hive-style
    partitioning. Timestamps serialize as ISO-8601 strings — reload
    with an explicit schema to round-trip them (read_jsonl docstring).
    Row-oriented text is ~5-10x the bytes of parquet at scale: use for
    EXPORT boundaries, never as the engine's resident format."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
