"""Expression layer of the hustle query DSL.

The reference overloads Python operators on its ``Column`` objects to
build predicate trees evaluated per-marble with EWAH bitset algebra
(public repo: ``hustle/core/marble.py`` — Column / expression classes).
Here each DSL node *wraps* a ``pyspark.sql.Column`` (we wrap rather than
subclass so our operator overloads can never collide with PySpark's),
and the "evaluation" is simply handing Catalyst the expression: indexed
predicates become Parquet row-group/bloom pushdown automatically.

Surface parity:

- comparisons ``== != < <= > >=``  (marble.py expression nodes)
- boolean combinators ``& | ~``
- IN-list via ``column << [v1, v2]`` (reference's overloaded lshift)
- EXT beyond the reference: arithmetic ``+ - * / %``, ``.isin``,
  ``.like``, ``.rlike``, ``.substr``, ``.cast``, ``.alias`` — computed
  projections did not exist in hustle (select list was bare columns or
  aggregates only) but are required by the north star.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable

from pyspark.sql import Column as SparkColumn
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from .table import Table


def _unwrap(value: Any) -> Any:
    if isinstance(value, Expr):
        return value.scol
    return value


class Expr:
    """A DSL expression: a wrapped Spark Column + the Tables it touches."""

    __slots__ = ("scol", "tables", "name")

    def __init__(self, scol: SparkColumn, tables: frozenset = frozenset(), name: str | None = None):
        self.scol = scol
        self.tables = tables
        self.name = name

    def _bin(self, other: Any, op) -> "Expr":
        tables = self.tables | (other.tables if isinstance(other, Expr) else frozenset())
        return Expr(op(self.scol, _unwrap(other)), tables)

    # --- comparisons (parity: marble.py expression nodes) ---
    def __eq__(self, other):  # type: ignore[override]
        return self._bin(other, lambda a, b: a == b)

    def __ne__(self, other):  # type: ignore[override]
        return self._bin(other, lambda a, b: a != b)

    def __lt__(self, other):
        return self._bin(other, lambda a, b: a < b)

    def __le__(self, other):
        return self._bin(other, lambda a, b: a <= b)

    def __gt__(self, other):
        return self._bin(other, lambda a, b: a > b)

    def __ge__(self, other):
        return self._bin(other, lambda a, b: a >= b)

    # --- boolean combinators ---
    def __and__(self, other):
        return self._bin(other, lambda a, b: a & b)

    def __or__(self, other):
        return self._bin(other, lambda a, b: a | b)

    def __invert__(self):
        return Expr(~self.scol, self.tables)

    # --- IN-list: reference's `column << [v1, v2, ...]` ---
    def __lshift__(self, values: Iterable[Any]):
        return self.isin(*list(values))

    def isin(self, *values: Any) -> "Expr":
        if len(values) == 1 and isinstance(values[0], (list, tuple, set)):
            values = tuple(values[0])
        # unwrap DSL wrappers: a raw Expr/Column would reach the JVM as
        # an unsupported-literal py4j error instead of a column ref
        unwrapped = [v.scol if isinstance(v, Expr) else v for v in values]
        tables = list(self.tables)
        for v in values:
            if isinstance(v, Expr):
                tables.extend(t for t in v.tables if t not in tables)
        return Expr(self.scol.isin(*unwrapped), tables)

    # --- EXT: arithmetic / computed projections ---
    def __add__(self, other):
        return self._bin(other, lambda a, b: a + b)

    def __radd__(self, other):
        return Expr(_unwrap(other) + self.scol, self.tables)

    def __sub__(self, other):
        return self._bin(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return Expr(_unwrap(other) - self.scol, self.tables)

    def __mul__(self, other):
        return self._bin(other, lambda a, b: a * b)

    def __rmul__(self, other):
        return Expr(_unwrap(other) * self.scol, self.tables)

    def __truediv__(self, other):
        return self._bin(other, lambda a, b: a / b)

    def __rtruediv__(self, other):
        return Expr(_unwrap(other) / self.scol, self.tables)

    def __mod__(self, other):
        return self._bin(other, lambda a, b: a % b)

    def __neg__(self):
        return Expr(-self.scol, self.tables)

    # --- EXT: misc column ops ---
    def alias(self, name: str) -> "Expr":
        return Expr(self.scol.alias(name), self.tables, name=name)

    def cast(self, dtype) -> "Expr":
        return Expr(self.scol.cast(dtype), self.tables, name=self.name)

    def like(self, pattern: str) -> "Expr":
        return Expr(self.scol.like(pattern), self.tables)

    def rlike(self, pattern: str) -> "Expr":
        return Expr(self.scol.rlike(pattern), self.tables)

    def substr(self, start: int, length: int) -> "Expr":
        return Expr(self.scol.substr(start, length), self.tables)

    def is_null(self) -> "Expr":
        return Expr(self.scol.isNull(), self.tables)

    def is_not_null(self) -> "Expr":
        return Expr(self.scol.isNotNull(), self.tables)

    def asc(self) -> "Expr":
        return Expr(self.scol.asc(), self.tables, name=self.name)

    def desc(self) -> "Expr":
        return Expr(self.scol.desc(), self.tables, name=self.name)

    def __hash__(self):  # __eq__ is overloaded, keep Exprs usable in dicts
        return id(self)

    def __repr__(self):
        return f"Expr({self.scol!r})"

    def __bool__(self):
        raise TypeError(
            "hustle expressions cannot be used as Python booleans; "
            "combine with & | ~ (like the reference DSL)"
        )


class Column(Expr):
    """A table-bound column reference (``table.column`` in the DSL)."""

    __slots__ = ("table",)

    def __init__(self, table: "Table", name: str):
        super().__init__(F.col(f"{table.name}.{name}"), frozenset({table}), name=name)
        self.table = table

    @property
    def fullname(self) -> str:
        return f"{self.table.name}.{self.name}"

    def __repr__(self):
        return f"Column({self.fullname})"

    def __hash__(self):
        # identity, like Expr: a CONTENT hash makes dict/set lookups
        # with an equal-but-distinct Column (every attribute access
        # builds a fresh one) collide and call the overloaded __eq__,
        # whose Expr result cannot be coerced to bool -> TypeError.
        # Identity hashing degrades that to an honest KeyError.
        return id(self)


class Aggregate:
    """A DSL aggregate: ``h_sum(col)`` etc.

    The reference models an aggregate as an Aggregation triple of
    accumulate / merge / result functions executed partial-in-scan-stage
    then final-in-reduce-stage (public repo: ``hustle/core/marble.py``
    Aggregation; ``hustle/core/pipeline.py`` group stages). Spark's
    HashAggregate partial+final is the same dataflow, JVM-side.
    """

    __slots__ = ("scol", "tables", "name", "default_name")

    def __init__(self, scol: SparkColumn, tables: frozenset, default_name: str):
        self.scol = scol
        self.tables = tables
        self.name: str | None = None
        self.default_name = default_name

    def alias(self, name: str) -> "Aggregate":
        out = Aggregate(self.scol, self.tables, self.default_name)
        out.name = name
        return out

    @property
    def output_name(self) -> str:
        return self.name or self.default_name

    def spark_agg(self) -> SparkColumn:
        return self.scol.alias(self.output_name)

    def __repr__(self):
        return f"Aggregate({self.output_name})"
