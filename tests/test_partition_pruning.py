"""SURVEY S2 parity: partition predicates prune whole partitions before
any data is read — the DDFS-tag-selection analogue — plus the stateful
streaming operator."""

from pyspark.sql import functions as F

import hustle_spark as h
from hustle_spark.plans import explain_str


def test_partition_pruning_reaches_scan(spark, tmp_path):
    cat = h.connect(spark, tmp_path)
    cat.create("imps", ["index string date", "index uint32 ad_id"], partition="date")
    df = spark.createDataFrame(
        [(f"2014-01-{20 + i % 3:02d}", 1000 + i) for i in range(30)],
        "date string, ad_id long",
    )
    cat.append("imps", df)
    t = cat.table("imps")
    q = h.select(t.ad_id, where=t.date == "2014-01-21")
    plan = explain_str(q)
    # Catalyst partition pruning: the partition filter appears as a
    # PartitionFilters entry on the scan, not a post-scan Filter
    assert "PartitionFilters" in plan and "2014-01-21" in plan
    assert q.count() == 10


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Dynamic partition pruning — the 100 TB join pattern: a fact
    table partitioned on the join key joined to a FILTERED dim must
    prune fact partitions at RUNTIME from the dim's build side (the
    static planner cannot know which keys survive the dim filter).
    Without DPP a warehouse-scale fact scan reads every partition."""
    cat = h.connect(spark, tmp_path)
    cat.create(
        "fact", ["index string region_key", "uint32 amount"],
        partition="region_key",
    )
    fact = spark.createDataFrame(
        [(f"r{i % 8}", i) for i in range(400)],
        "region_key string, amount long",
    )
    cat.append("fact", fact)
    dim = spark.createDataFrame(
        [(f"r{i}", "keep" if i < 2 else "drop") for i in range(8)],
        "region_key string, flag string",
    )
    f = cat.table("fact").df
    joined = f.join(dim.filter(F.col("flag") == "keep"), "region_key").groupBy(
        "region_key"
    ).agg(F.sum("amount").alias("s"))
    plan = explain_str(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() == 2


def test_stateful_streaming_equals_batch(spark):
    from hustle_spark import streaming as S
    from hustle_spark.streaming.stateful import running_user_totals

    events = S.read_events_stream(spark, "/root/testdata/sf0.001")
    out = S.run_streaming_batch(running_user_totals(events), output_mode="update")
    # latest emission per user == batch aggregate
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    latest = (
        out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    batch_events = h.connect(spark, "/root/testdata/sf0.001").table("events").df
    batch = batch_events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
    )
    assert sorted(map(tuple, latest.collect())) == sorted(map(tuple, batch.collect()))


def test_foreach_batch_sink_idempotent(spark, tmp_path):
    from hustle_spark import streaming as S
    from hustle_spark.streaming.sinks import foreach_batch_parquet

    events = S.read_events_stream(spark, "/root/testdata/sf0.001")
    agg = S.tumbling_window_agg(events)
    out = tmp_path / "sink"
    q = foreach_batch_parquet(agg, out, tmp_path / "ckpt")
    q.awaitTermination(120)
    first = spark.read.parquet(str(out)).count()
    assert first > 0
    # restart with the same checkpoint: availableNow sees no new files,
    # writes nothing new (exactly-once on top of source offsets)
    q2 = foreach_batch_parquet(agg, out, tmp_path / "ckpt")
    q2.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == first


def test_hourly_rollup_matches_raw(spark, tmp_path):
    from hustle_spark import streaming as S
    from hustle_spark.operators.rollup_view import (
        hourly_partials,
        maintain_rollup,
        read_rollup,
    )

    events = S.read_events_stream(spark, "/root/testdata/sf0.001")
    q = maintain_rollup(events, tmp_path / "rollup", tmp_path / "ckpt")
    q.awaitTermination(120)
    rolled = read_rollup(spark, tmp_path / "rollup")

    raw = h.connect(spark, "/root/testdata/sf0.001").table("events").df
    expected = hourly_partials(raw).select(
        "hour", "event_type", "n",
        (F.col("cents").cast("double") / 100.0).alias("total_value"),
    )
    assert sorted(map(tuple, rolled.collect())) == sorted(map(tuple, expected.collect()))

    # idempotence: a second maintenance run with the same checkpoint
    # sees no new data and changes nothing
    q2 = maintain_rollup(events, tmp_path / "rollup", tmp_path / "ckpt")
    q2.awaitTermination(120)
    assert sorted(map(tuple, read_rollup(spark, tmp_path / "rollup").collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_read_rollup_empty_and_hour_partitioned(spark, tmp_path):
    from pyspark.sql import functions as F

    from hustle_spark.operators.rollup_view import (
        maintain_rollup,
        read_rollup,
    )

    # empty rollup (never maintained): empty frame, not an error
    assert read_rollup(spark, tmp_path / "nothing").count() == 0

    import datetime as dt

    src = tmp_path / "ev_src"
    src.mkdir()
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 5), "click", 0.615),
         (2, dt.datetime(2024, 1, 1, 11, 5), "view", 1.0)],
        "event_id long, ts timestamp, event_type string, value double",
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(str(src / "*"))
    q = maintain_rollup(stream, tmp_path / "roll", tmp_path / "roll_ckpt")
    assert q.awaitTermination(120)
    out = {(r.hour, r.event_type): (r.n, r.total_value)
           for r in read_rollup(spark, tmp_path / "roll").collect()}
    h10 = int(dt.datetime(2024, 1, 1, 10).timestamp())
    # decimal-exact cents: 0.615 -> 62 cents, not the double-space 61
    assert out[(h10, "click")] == (1, 0.62)
    # hour partition dirs exist inside the batch dir (pruning surface)
    assert list((tmp_path / "roll").glob("batch=*/hour=*"))
