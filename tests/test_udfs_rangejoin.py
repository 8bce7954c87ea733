"""Wave-3 operators: range join boundaries, UDF/UDAF/UDTF surface."""

import datetime as dt

from pyspark.sql import functions as F


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_range_join_boundaries(spark):
    from hustle_spark.operators.rangejoin import range_join

    left = spark.createDataFrame([(1, ts("2024-01-01T10:00:00"), "L")], "k long, ts timestamp, side string")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:55:00"), "in_lo"),     # exactly -5 min: in
         (1, ts("2024-01-01T10:05:00"), "in_hi"),     # exactly +5 min: in
         (1, ts("2024-01-01T09:54:59"), "out_lo"),
         (1, ts("2024-01-01T10:05:01"), "out_hi"),
         (2, ts("2024-01-01T10:00:00"), "wrong_key")],
        "k long, ts timestamp, side string",
    )
    out = range_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     lower="-5 minutes", upper="5 minutes")
    got = sorted(r.side_r for r in out.collect())
    assert got == ["in_hi", "in_lo"]


def test_range_join_bad_bounds(spark):
    import pytest
    from hustle_spark.operators.rangejoin import range_join

    df = spark.createDataFrame([(1, ts("2024-01-01T10:00:00"))], "k long, ts timestamp")
    with pytest.raises(ValueError, match="exceeds"):
        range_join(df, df, on="k", left_ts="ts", right_ts="ts",
                   lower="5 minutes", upper="-5 minutes")


def test_pandas_udf_token_count(spark):
    from hustle_spark.functions.udfs import bpe_ish_token_count_udf

    df = spark.createDataFrame([("hello world, 42!",), ("",)], "t string")
    got = [r.n for r in df.select(bpe_ish_token_count_udf(F.col("t")).alias("n")).collect()]
    # hello, world, comma, 4, 2, bang -> 6; empty -> 0
    assert got == [6, 0]


def test_udaf_slope_exact(spark):
    from hustle_spark.functions.udfs import regression_slope_by_user

    # value rises exactly 1.00 (100 cents) per second -> slope 100 cents/s
    rows = [(1, dt.datetime(2024, 1, 1, 0, 0, s), float(s)) for s in range(5)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = regression_slope_by_user(df).collect()
    assert out[0].n == 5 and abs(out[0].slope - 100.0) < 1e-12


def test_udtf_shingles(spark):
    from hustle_spark.functions.udfs import explode_shingles_udtf

    df = spark.createDataFrame([(1, "a b c d"), (2, "x y")], "doc_id long, text string")
    got = sorted((r.doc_id, r.shingle) for r in explode_shingles_udtf(df, n=3).collect())
    assert got == [(1, "a b c"), (1, "b c d"), (2, "x y")]
