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
from pyspark.sql import types as T


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
