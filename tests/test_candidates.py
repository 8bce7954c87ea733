"""Round-8 candidate rows (hustle_spark/candidates.py): every staged
(query fn, oracle SQL) pair must match DuckDB exactly at the gate SF
BEFORE it is ever registered — the r8 ``_NEW_THIS_ROUND`` flip lifts
these pairs verbatim, so this is the same bar the driver will apply."""

import pytest

from hustle_spark.candidates import STAGED_CANDIDATES
from tests.conftest import SF_DIR


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(vals[i] for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(STAGED_CANDIDATES))
def test_candidate_matches_oracle(spark, duck, name):
    fn, oracle = STAGED_CANDIDATES[name]
    df = fn(spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    rel = duck.execute(oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: cols {sorted(spark_cols)} vs {sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} vs {len(duck_rows)} rows"
    )
    a = _norm(spark_rows, spark_cols)
    b = _norm(duck_rows, duck_cols)
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diffs, f"{name}: {len(diffs)} differing rows, first {diffs[:2]}"
    assert len(spark_rows) > 0, f"{name}: empty result"
