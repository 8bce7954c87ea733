"""Shared assertion helpers: order-insensitive DataFrame vs DuckDB compare,
mirroring the driver's oracle gate (row-count + schema names + values)."""

from __future__ import annotations

import math


def normalize(rows, colnames):
    """Rows -> sorted list of tuples with column order sorted by name.

    Values are compared EXACTLY (repr for floats, so int 3 != float 3.0),
    mirroring the driver's exact value hash. Any query needing tolerance
    must build it into the query itself (decimal funnel / floor-scaling),
    not into this harness — round(v, 4) here is how scalar_math_funcs
    passed pytest yet failed the driver in round 1."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)  # exact, and type-distinguishing vs int
        if isinstance(v, list):
            return tuple(norm_val(x) for x in v)
        return v

    return sorted(
        (tuple(norm_val(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),  # None-safe total order
    )


def assert_df_matches_duck(df, duck, sql, check_names=True):
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    if check_names:
        assert sorted(spark_cols) == sorted(duck_cols), (
            f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    a = normalize(spark_rows, spark_cols)
    b = normalize(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"value mismatch, first diffs: {mismatches[:3]}"
