"""The DSL ``Table``: a named DataFrame with hustle-style schema info.

Reference semantics (public repo: ``hustle/__init__.py`` Table):
``Table.from_tag(name)`` reads the schema off a DDFS tag and yields an
object whose attributes are Column references usable in ``select``.
Here a Table wraps a DataFrame (aliased to the table name so join
disambiguation works) plus the parsed :class:`TableSchema` when one was
declared.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame

from .expr import Column
from .schema import TableSchema

if TYPE_CHECKING:
    from .catalog import Catalog


class Table:
    def __init__(
        self,
        name: str,
        df: DataFrame,
        schema: TableSchema | None = None,
        catalog: "Catalog | None" = None,
    ):
        # alias so `table.column` resolves unambiguously inside joins
        self._df = df.alias(name)
        self.name = name
        self.hustle_schema = schema
        self.catalog = catalog

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def columns(self) -> list[str]:
        return self._df.columns

    @property
    def partition(self) -> str | None:
        return self.hustle_schema.partition if self.hustle_schema else None

    def __getattr__(self, item: str) -> Column:
        if item.startswith("_"):
            raise AttributeError(item)
        if item in self._df.columns:
            return Column(self, item)
        raise AttributeError(f"table {self.name!r} has no column {item!r}")

    def __getitem__(self, item: str) -> Column:
        # subscription reaches EVERY df column — including names that
        # start with '_' or that shadow Table attributes (name, df,
        # columns, ...), which attribute access cannot express
        if item in self._df.columns:
            return Column(self, item)
        raise KeyError(f"table {self.name!r} has no column {item!r}")

    def __iter__(self) -> Iterator[Column]:
        return (Column(self, c) for c in self._df.columns)

    def dump(self, n: int = 100, truncate: bool = False) -> None:
        """Reference ``dump(result)`` / REPL auto-dump: pretty-print
        rows (public repo: ``hustle/__init__.py``)."""
        self._df.show(n, truncate=truncate)

    def __repr__(self):
        return f"Table({self.name}: {', '.join(self.columns)})"


def dump(result, n: int = 100) -> None:
    """Reference ``dump``: works on Tables and raw DataFrames."""
    df = result.df if isinstance(result, Table) else result
    df.show(n, truncate=False)


def star(table: Table) -> list[Column]:
    """Reference ``star(table)``: expand to all columns
    (public repo: ``hustle/__init__.py``)."""
    return [Column(table, c) for c in table.columns]
