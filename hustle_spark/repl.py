"""Interactive shell — the ``bin/hustle`` analogue.

The reference's primary UX surface (public repo tspurway/hustle,
``bin/hustle``) is an interactive shell that connects to the catalog,
preloads the query DSL plus one variable per table, and auto-prints
every query result as you evaluate it. Same contract here, as a
package entry point::

    python -m hustle_spark [catalog_dir]

    >>> select(lineitem.l_returnflag, h_sum(lineitem.l_quantity),
    ...        where=lineitem.l_shipdate > '1995-01-01')
    ... # result table prints immediately — no .show() needed

Auto-dump parity is a ``sys.displayhook``: evaluating an expression
that yields a DataFrame or Table dumps its first rows instead of
printing the lazy JVM repr. Plain values print normally and ``_``
still holds the last result, like the default hook.
"""

from __future__ import annotations

import builtins
import code
import sys

import hustle_spark as h

AUTO_DUMP_ROWS = 25

_DSL_NAMES = (
    "select star insert h_sum h_count h_avg h_min h_max h_cardinality "
    "h_count_distinct h_collect_set"
).split()


def _display(value) -> None:
    """displayhook: auto-dump DataFrame/Table results (bin/hustle
    printed every query's rows), default behavior otherwise."""
    from pyspark.sql import DataFrame

    from .table import Table, dump

    if value is None:
        return
    builtins._ = value
    if isinstance(value, DataFrame):
        dump(value, n=AUTO_DUMP_ROWS)
    elif isinstance(value, Table):
        value.dump(AUTO_DUMP_ROWS)
    else:
        print(repr(value))


def build_namespace(spark, cat) -> dict:
    """The preloaded REPL namespace: session + catalog + DSL + one
    variable per catalog table."""
    from .table import dump

    ns = {
        "spark": spark,
        "catalog": cat,
        "dump": dump,
        # bin/hustle's introspection trio, preloaded as bare callables
        "tables": cat.tables,
        "schema": cat.schema,
        "partitions": cat.partitions,
    }
    for fn in _DSL_NAMES:
        ns[fn] = getattr(h, fn)
    for t in cat.tables():
        try:
            ns[t] = cat.table(t)
        except Exception as exc:  # unreadable table: name it, keep going
            print(f"  (skipping table {t}: {exc})", file=sys.stderr)
    return ns


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    root = argv[0] if argv else "/root/testdata/sf0.001"
    scratch = argv[1] if len(argv) > 1 else "/root/repo/.scratch/repl"
    spark = h.get_session(app_name="hustle-spark-repl")
    spark.sparkContext.setLogLevel("ERROR")  # keep the prompt readable
    cat = h.connect(spark, root, scratch=scratch)
    ns = build_namespace(spark, cat)
    names = cat.tables()
    banner = (
        f"hustle-spark {h.__version__} — catalog {root}\n"
        f"tables: {', '.join(names)}\n"
        f"DSL preloaded: {', '.join(_DSL_NAMES)}; results auto-dump "
        f"(first {AUTO_DUMP_ROWS} rows); schema via catalog.schema('t')"
    )
    old_hook = sys.displayhook
    sys.displayhook = _display
    try:
        code.interact(banner=banner, local=ns, exitmsg="")
    finally:
        sys.displayhook = old_hook


if __name__ == "__main__":
    main()
