"""Bulk JSON event ingest — the reference's ``insert(...)``.

Reference (public repo: ``hustle/__init__.py`` insert →
``hustle/core/marble.py`` marble build): a *client-side* loop decodes
newline-JSON (ujson), applies an optional ``preprocess(row)`` hook,
coerces to the declared column types (unknown fields dropped), packs an
LMDB marble, and ``ddfs.push``-es it under the table tag when
``maxsize`` is exceeded.

Spark mapping: ``spark.read.schema(declared).json(path)`` gives the
same decode+coerce+drop semantics (schema-on-read discards undeclared
fields; type coercion per declared type), the ``preprocess`` hook
becomes a DataFrame transformation (or Arrow-batched Pandas UDF), and
the write is an append into the partitioned Parquet table. Unlike the
reference this path is *distributed* — ingest parallelism scales with
the cluster instead of one client process; there is no ``maxsize``
marble-roll knob because Parquet file sizing is handled by
``spark.sql.files.maxRecordsPerFile`` / partition sizing.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from .catalog import Catalog


def insert(
    catalog: Catalog,
    table: str,
    phile: str | None = None,
    streams: DataFrame | None = None,
    preprocess: Callable[[DataFrame], DataFrame] | None = None,
    decoder: str = "json",
) -> int:
    """Load events into ``table``; returns the number of rows ingested.

    ``phile``: path to newline-JSON (or CSV with ``decoder='csv'``).
    ``streams``: alternatively, an already-built DataFrame to append
    (the reference accepted open file streams here).
    ``preprocess``: DataFrame -> DataFrame hook, run before the write —
    the distributed analogue of the reference's per-row hook.
    """
    path, schema = catalog._resolve(table)
    if schema is None:
        raise ValueError(f"insert target {table!r} has no declared hustle schema")
    struct = schema.to_struct()

    if streams is not None:
        # coerce to declared schema: drop unknown columns, cast declared
        # ones, and fill declared-but-absent columns with typed NULLs so
        # every appended file carries the complete table schema in a
        # consistent order (directory reads infer from one footer —
        # a narrower file would silently lose columns)
        from pyspark.sql import functions as F

        present = set(streams.columns)
        if schema.partition and schema.partition not in present:
            # NULL-filling the partition column would silently route
            # every row to __HIVE_DEFAULT_PARTITION__, corrupting the
            # partition-lifecycle (delete-by-partition) model — fail
            # loudly instead, like the pre-fill behavior did
            raise ValueError(
                f"insert into {table!r}: partition column "
                f"{schema.partition!r} missing from input"
            )
        df = streams.select(
            *[
                (streams[f.name].cast(f.dataType) if f.name in present
                 else F.lit(None).cast(f.dataType)).alias(f.name)
                for f in struct.fields
            ]
        )
    elif phile is not None:
        if decoder == "json":
            df = catalog.spark.read.schema(struct).json(phile)
        elif decoder == "csv":
            df = catalog.spark.read.schema(struct).option("header", "true").csv(phile)
        else:
            raise ValueError(f"unknown decoder {decoder!r}")
    else:
        raise ValueError("insert needs phile= or streams=")

    if preprocess is not None:
        df = preprocess(df)

    n = df.count()
    catalog.append(table, df)
    return n
