"""Interactive shell — the ``bin/hustle`` analogue (public repo: an
interactive REPL preloading the DSL and tables from DDFS tags; here a
Python shell preloading the DSL and catalog tables as variables).

    python scripts/repl.py [catalog_dir]

Then e.g.::

    >>> select(lineitem.l_returnflag, h_sum(lineitem.l_quantity),
    ...        where=lineitem.l_shipdate > '1995-01-01').show()
"""

from __future__ import annotations

import code
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import hustle_spark as h  # noqa: E402


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = h.get_session(app_name="hustle-repl")
    cat = h.connect(spark, root, scratch="/root/repo/.scratch/repl")
    ns = {
        "spark": spark,
        "catalog": cat,
        "select": h.select,
        "star": h.star,
        "insert": h.insert,
        "dump": __import__("hustle_spark.table", fromlist=["dump"]).dump,
    }
    for fn in ("h_sum h_count h_avg h_min h_max h_cardinality h_count_distinct".split()):
        ns[fn] = getattr(h, fn)
    names = cat.tables()
    for t in names:
        try:
            ns[t] = cat.table(t)
        except Exception:
            pass
    banner = (
        f"hustle-spark {h.__version__} — tables: {', '.join(names)}\n"
        "DSL preloaded: select, star, insert, dump, h_sum/h_count/h_avg/"
        "h_min/h_max/h_cardinality/h_count_distinct"
    )
    code.interact(banner=banner, local=ns)


if __name__ == "__main__":
    main()
