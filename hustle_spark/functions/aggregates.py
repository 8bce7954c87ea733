"""The reference's six aggregate functions, plus EXT aggregates.

Parity set (public repo: ``hustle/__init__.py`` exports; backed by the
Aggregation accumulate/merge/result triple in ``hustle/core/marble.py``):
``h_sum h_count h_avg h_min h_max h_cardinality``. Each maps to a
Tungsten HashAggregate with map-side partial aggregation — the same
partial-then-final dataflow hustle ran across Disco stages, but
JVM-side and codegen'd.

``h_cardinality`` was approximate count-distinct via mergeable
HyperLogLog sketches (cardunion C lib, ``deps/``). Spark's
``approx_count_distinct`` is HLL++ — the same sketch family. Because an
approximate result can never hash-match an exact SQL oracle, we also
provide exact ``h_count_distinct`` (SURVEY.md section 2.4 A6).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from ..expr import Aggregate, Expr


def _col_and_tables(col: Expr | str):
    if isinstance(col, Expr):
        return col.scol, col.tables
    return F.col(col), frozenset()


def h_sum(col: Expr | str) -> Aggregate:
    scol, tables = _col_and_tables(col)
    return Aggregate(F.sum(scol), tables, "sum")


def h_count() -> Aggregate:
    # reference: h_count() takes no column — counts rows
    return Aggregate(F.count(F.lit(1)), frozenset(), "count")


def h_avg(col: Expr | str) -> Aggregate:
    scol, tables = _col_and_tables(col)
    return Aggregate(F.avg(scol), tables, "avg")


def h_min(col: Expr | str) -> Aggregate:
    scol, tables = _col_and_tables(col)
    return Aggregate(F.min(scol), tables, "min")


def h_max(col: Expr | str) -> Aggregate:
    scol, tables = _col_and_tables(col)
    return Aggregate(F.max(scol), tables, "max")


def h_cardinality(col: Expr | str, rsd: float | None = None) -> Aggregate:
    """Approximate count-distinct (HLL++, mergeable like cardunion)."""
    scol, tables = _col_and_tables(col)
    agg = F.approx_count_distinct(scol, rsd) if rsd is not None else F.approx_count_distinct(scol)
    return Aggregate(agg, tables, "cardinality")


# --- EXT aggregates (absent in the reference; SURVEY section 2.4 A9) ---

def h_count_distinct(col: Expr | str) -> Aggregate:
    scol, tables = _col_and_tables(col)
    return Aggregate(F.countDistinct(scol), tables, "count_distinct")


def h_stddev(col: Expr | str) -> Aggregate:
    scol, tables = _col_and_tables(col)
    return Aggregate(F.stddev(scol), tables, "stddev")


def h_variance(col: Expr | str) -> Aggregate:
    scol, tables = _col_and_tables(col)
    return Aggregate(F.variance(scol), tables, "variance")


def h_first(col: Expr | str) -> Aggregate:
    scol, tables = _col_and_tables(col)
    return Aggregate(F.first(scol), tables, "first")


def h_last(col: Expr | str) -> Aggregate:
    scol, tables = _col_and_tables(col)
    return Aggregate(F.last(scol), tables, "last")


def h_collect_set(col: Expr | str) -> Aggregate:
    scol, tables = _col_and_tables(col)
    return Aggregate(F.collect_set(scol), tables, "collect_set")


def h_percentile(col: Expr | str, q: float | list[float], accuracy: int = 10000) -> Aggregate:
    scol, tables = _col_and_tables(col)
    return Aggregate(F.percentile_approx(scol, q, accuracy), tables, "percentile")


def agg_expr(spark_agg_col: Any, name: str, tables: frozenset = frozenset()) -> Aggregate:
    """Escape hatch: wrap any Spark aggregate Column as a DSL aggregate."""
    return Aggregate(spark_agg_col, tables, name)


# --- deterministic float aggregation -------------------------------------
#
# Floating-point SUM/AVG are nondeterministic at the bit level across
# partitionings (addition is not associative), so the same query can
# produce different last-bits run to run — and can never hash-match an
# external oracle. At 100 TB with AQE re-planning stages between
# retries, that nondeterminism also breaks idempotent re-runs. These
# helpers funnel the arithmetic through exact DECIMAL accumulation
# (inputs with fixed decimal precision, e.g. money), making results
# bit-identical regardless of partitioning, shuffle order, or engine.

def h_sum_exact(col: Expr | str, scale: int = 2) -> Aggregate:
    """SUM via exact decimal accumulation, returned as double."""
    scol, tables = _col_and_tables(col)
    agg = F.sum(scol.cast(f"decimal(18,{scale})")).cast("double")
    return Aggregate(agg, tables, "sum")


def h_avg_exact(col: Expr | str, scale: int = 2) -> Aggregate:
    """AVG as exact-decimal SUM divided by the NON-NULL count of the
    column (SQL AVG semantics — dividing by COUNT(*) would silently
    skew the mean downward on any NULL input), cast to a deterministic
    double."""
    scol, tables = _col_and_tables(col)
    agg = F.sum(scol.cast(f"decimal(18,{scale})")).cast("double") / F.count(scol)
    return Aggregate(agg, tables, "avg")
