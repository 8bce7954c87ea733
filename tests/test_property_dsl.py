"""Property-based differential testing (beyond the reference's fixed
inline asserts): random predicate trees evaluated by the DSL vs DuckDB."""

from hypothesis import given, settings, strategies as st

import hustle_spark as h

NUM_COLS = ["o_totalprice", "o_custkey"]
OPS = ["lt", "le", "gt", "ge", "eq", "ne"]


def leaf_to_dsl(t, leaf):
    col, op, val = leaf
    c = t[col]
    return {
        "lt": c < val, "le": c <= val, "gt": c > val,
        "ge": c >= val, "eq": c == val, "ne": c != val,
    }[op]


def leaf_to_sql(leaf):
    col, op, val = leaf
    sym = {"lt": "<", "le": "<=", "gt": ">", "ge": ">=", "eq": "=", "ne": "!="}[op]
    return f"{col} {sym} {val!r}"


leaves = st.tuples(
    st.sampled_from(NUM_COLS),
    st.sampled_from(OPS),
    st.integers(min_value=0, max_value=500000),
)
trees = st.lists(leaves, min_size=1, max_size=3)
combos = st.lists(st.sampled_from(["and", "or"]), min_size=2, max_size=2)


@settings(max_examples=12, deadline=None)
@given(tree=trees, ops=combos)
def test_random_predicates_match_duckdb(tree, ops, spark, catalog, duck):
    t = catalog.table("orders")
    expr = leaf_to_dsl(t, tree[0])
    sql = leaf_to_sql(tree[0])
    for i, leaf in enumerate(tree[1:]):
        op = ops[i % len(ops)]
        if op == "and":
            expr = expr & leaf_to_dsl(t, leaf)
            sql = f"({sql}) AND {leaf_to_sql(leaf)}"
        else:
            expr = expr | leaf_to_dsl(t, leaf)
            sql = f"({sql}) OR {leaf_to_sql(leaf)}"
    got = h.select(t.o_orderkey, where=expr).count()
    exp = duck.execute(f"SELECT COUNT(*) FROM orders WHERE {sql}").fetchone()[0]
    assert got == exp, f"predicate {sql}: spark={got} duck={exp}"


AGG_FNS = ["sum", "min", "max", "count"]
GROUP_COLS = ["o_orderstatus", "o_orderpriority"]


@settings(max_examples=10, deadline=None)
@given(
    group=st.sampled_from(GROUP_COLS),
    fn=st.sampled_from(AGG_FNS),
    cutoff=st.integers(min_value=0, max_value=400000),
)
def test_random_aggregates_match_duckdb(group, fn, cutoff, spark, catalog, duck):
    t = catalog.table("orders")
    hfn = {"sum": h.h_sum, "min": h.h_min, "max": h.h_max}.get(fn)
    agg = h.h_count().alias("v") if fn == "count" else hfn(t.o_totalprice).alias("v")
    df = h.select(t[group], agg, where=t.o_totalprice > float(cutoff))
    got = {r[0]: (round(r[1], 4) if isinstance(r[1], float) else r[1]) for r in df.collect()}
    sql_fn = "COUNT(*)" if fn == "count" else f"{fn.upper()}(o_totalprice)"
    exp = {
        r[0]: (round(r[1], 4) if isinstance(r[1], float) else r[1])
        for r in duck.execute(
            f"SELECT {group}, {sql_fn} FROM orders WHERE o_totalprice > {cutoff} GROUP BY 1"
        ).fetchall()
    }
    assert got == exp
