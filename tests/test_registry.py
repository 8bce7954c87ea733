"""Registry conformance: every oracle-checkable query hash-matches the
DuckDB oracle at sf0.001 (the driver runs the same gate at sf0.01),
and every rows-only query at least executes and returns a stable schema."""

import pytest

import __spark_entry__ as entrymod

from helpers import assert_df_matches_duck


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


ALL = sorted(entrymod.queries().keys())
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(name, spark, duck, catalog):
    fn = entrymod.queries()[name]
    df = fn(spark, "/root/testdata/sf0.001")
    if name in ORACLES:
        assert_df_matches_duck(df, duck, ORACLES[name])
    else:
        rows = df.collect()
        assert rows is not None  # rows-only contract: runs, stable schema
        assert len(df.columns) > 0


def test_window_priority_ordering():
    """The driver verifies exactly the first 50 entries of queries();
    pin the rotation invariants so a registry edit can't silently
    shrink coverage (docs/CHECKED.md is the per-round manifest; the
    content-hash invariant lives in tests/test_window_invariant.py)."""
    from hustle_spark import registry

    names = list(registry.queries())
    assert len(names) == len(set(names)), "duplicate query names"
    window = names[:50]
    # everything without a driver row — changed since its last row or
    # registered this round — must sit inside the window
    must_check = set(registry._CHANGED) | set(registry._NEW_THIS_ROUND)
    assert must_check <= set(registry.QUERIES)
    missing = must_check - set(window)
    assert not missing, f"must-check queries outside window: {missing}"
    # every window entry is oracle-bound UNLESS it is a must-check
    # promotion: a changed rows-only sketch still needs its (weaker)
    # driver row refreshed — the window-sort invariant outranks the
    # slot-economy preference. PROVEN rows-only entries must not burn
    # backfill slots.
    import __spark_entry__ as entry

    osql = entry.oracle_sql()
    no_oracle = [n for n in window if n not in osql and n not in must_check]
    assert not no_oracle, (
        f"proven rows-only entries burning window slots: {no_oracle}"
    )
    # oracle_sql keys must be a subset of queries and aligned by name
    osql = registry.oracle_sql()
    assert set(osql) <= set(names)


def test_lifecycle_queries_rerun_stable(spark):
    """The scratch-writing lifecycle queries must be RE-RUNNABLE in one
    session with identical results (the driver, check_oracle, and an
    interactive user may each invoke them; a stale scratch dir or
    non-idempotent stream checkpoint would make the second run lie)."""
    from hustle_spark import registry

    for name in (
        "compact_requery",
        "streaming_ingest_dedup_requery",
        "insert_jsonl_requery",
        "delete_partition_requery",
    ):
        fn = registry.QUERIES[name].fn
        first = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
        second = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
        assert first == second, f"{name} not re-run stable"
        assert first, f"{name} returned no rows at sf0.001"


def test_oracle_gate_dtype_directions(spark):
    """The check_oracle dtype gate's WARN downgrade must apply ONLY
    when BOTH engines emit a nested type (no canonical cross-engine
    spelling); a Spark struct/map against a DuckDB scalar — or the
    reverse — is a genuine value-class mismatch and must stay a HARD
    failure (ADVICE r6 #3; VERDICT r7 directive #8 asked for this
    test)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import duckdb
    from check_oracle import dtype_problems

    con = duckdb.connect()

    struct_df = spark.createDataFrame(
        [((1, "a"),)], "c struct<x:int, y:string>"
    )
    map_df = spark.createDataFrame([({"k": 1},)], "c map<string,int>")
    scalar_df = spark.createDataFrame([(1,)], "c bigint")

    duck_scalar = con.sql("SELECT 1::BIGINT AS c")
    duck_struct = con.sql("SELECT {'x': 1, 'y': 'a'} AS c")
    duck_map = con.sql("SELECT MAP(['k'], [1]) AS c")

    # both nested -> WARN (no canonical spelling), never hard
    hard, warns = dtype_problems(struct_df, duck_struct)
    assert not hard and warns
    hard, warns = dtype_problems(map_df, duck_map)
    assert not hard and warns

    # Spark nested vs DuckDB scalar -> HARD, never a warn
    hard, warns = dtype_problems(struct_df, duck_scalar)
    assert hard and not warns
    hard, warns = dtype_problems(map_df, duck_scalar)
    assert hard and not warns

    # DuckDB nested vs Spark scalar -> HARD too (the reverse direction)
    hard, warns = dtype_problems(scalar_df, duck_struct)
    assert hard and not warns
    hard, warns = dtype_problems(scalar_df, duck_map)
    assert hard and not warns

    # scalar/scalar equal types -> clean
    hard, warns = dtype_problems(scalar_df, duck_scalar)
    assert not hard and not warns


def test_ann_pair_recall_contract():
    """The executable ANN recall floor (VERDICT r13 "What's wrong"
    #1): ann_pair_recall judges an approximate row by the fraction of
    true (query_id, vec_id) hits it returned, ignoring rank/score
    wobble; the floor constants pin the documented 13/15 sf0.1
    measurement so a silent recall regression FAILS the 10x sweep
    instead of reading as "a few more differing values"."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from check_oracle import ANN_RECALL_FLOOR, ann_pair_recall

    cols = ["query_id", "vec_id", "cosine_u", "rank"]
    truth = [(0, v, 100 - v, v + 1) for v in range(5)]

    # identical hit set, scrambled ranks/scores -> recall 1.0
    scrambled = [(q, v, 0, 99) for q, v, *_ in truth]
    assert ann_pair_recall(scrambled, cols, truth, cols) == 1.0

    # one true hit replaced by a miss -> 4/5
    missed = scrambled[:4] + [(0, 777, 0, 5)]
    assert ann_pair_recall(missed, cols, truth, cols) == 0.8

    # column-order independence: spark side with reordered columns
    sp_cols = ["rank", "vec_id", "cosine_u", "query_id"]
    sp_rows = [(r[3], r[1], r[2], r[0]) for r in scrambled]
    assert ann_pair_recall(sp_rows, sp_cols, truth, cols) == 1.0

    # empty oracle degenerates to 1.0 (nothing to recall)
    assert ann_pair_recall([], cols, [], cols) == 1.0

    # the documented sf0.1 floor: 13/15 for both registered ANN rows
    assert ANN_RECALL_FLOOR == {
        "similarity_ann_lsh": 13 / 15,
        "similarity_ivf": 13 / 15,
    }
