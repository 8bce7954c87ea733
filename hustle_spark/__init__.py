"""hustle-spark: a PySpark-native engine with the query surface of
tspurway/hustle, extended per SURVEY.md.

Public DSL (parity with the reference's ``from hustle import *``):

>>> import hustle_spark as h
>>> spark = h.get_session()
>>> c = h.connect(spark, "/root/testdata/sf0.001")
>>> li = c.table("lineitem")
>>> h.select(li.l_returnflag, h.h_sum(li.l_quantity).alias("sum_qty"),
...          where=li.l_shipdate > "1995-01-01",
...          order_by=li.l_returnflag).show()
"""

from .catalog import Catalog, connect
from .dsl import select
from .expr import Aggregate, Column, Expr
from .functions.aggregates import (
    agg_expr,
    h_avg,
    h_avg_exact,
    h_cardinality,
    h_collect_set,
    h_count,
    h_count_distinct,
    h_first,
    h_last,
    h_max,
    h_min,
    h_percentile,
    h_stddev,
    h_sum,
    h_sum_exact,
    h_variance,
)
from .insert import insert
from .schema import ColumnSpec, TableSchema, parse_column_spec
from .settings import Settings, connect_from_settings, load_settings
from .session import get_session, tune_existing
from .table import Table, star

__all__ = [
    "Aggregate", "Catalog", "Column", "ColumnSpec", "Expr", "Table",
    "TableSchema", "agg_expr", "connect", "get_session", "h_avg",
    "h_cardinality", "h_collect_set", "h_count", "h_count_distinct",
    "h_first", "h_last", "h_max", "h_min", "h_percentile", "h_stddev",
    "h_sum", "h_sum_exact", "h_avg_exact", "h_variance", "insert", "parse_column_spec", "select",
    "star", "tune_existing", "Settings", "connect_from_settings", "load_settings",
]

__version__ = "0.1.0"
