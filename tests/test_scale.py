"""Scale-hardening helpers: plan audits, salted joins, catalog delete."""

import pytest
from pyspark.sql import functions as F

import hustle_spark as h
from hustle_spark.plans import audit_plan, salted_join, scale_configs


def test_audit_plan_clean_flagship(spark, catalog):
    li = catalog.table("lineitem")
    df = h.select(
        li.l_returnflag,
        h.h_sum(li.l_quantity).alias("s"),
        where=li.l_shipdate > "1995-01-01",
    )
    violations = audit_plan(
        df,
        expect_pushed=["l_shipdate"],
        max_read_columns=3,
        forbid_cartesian=True,
        forbid_python_udf=True,
    )
    assert violations == []


def test_audit_plan_catches_wide_scan(spark, catalog):
    li = catalog.table("lineitem")
    df = li.df  # full scan, all 11 columns
    violations = audit_plan(df, max_read_columns=3)
    assert any("columns" in v for v in violations)


def test_audit_plan_catches_cartesian(spark, catalog):
    r = catalog.table("region").df
    df = r.crossJoin(r.select(F.col("r_name").alias("rn2")))
    violations = audit_plan(df)
    assert any("cartesian" in v for v in violations)


def test_signature_stages_shuffle_free(spark, catalog):
    """The sketch/signature map stages are the proven shuffle-free hot
    paths of the dedup/similarity operators — at 100 TB a single
    Exchange here shuffles the whole corpus. Pin zero Exchange nodes so
    a rewrite (e.g. back to explode+groupBy) can't silently regress."""
    from hustle_spark.operators.dedup import minhash_signatures, simhash
    from hustle_spark.operators.similarity import lsh_signatures, quantize_int8
    from hustle_spark.plans import explain_str

    docs = catalog.table("documents").df
    emb = catalog.table("embeddings").df.withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    for label, frame in [
        ("minhash_signatures", minhash_signatures(docs, n_hashes=8)),
        ("simhash", simhash(docs)),
        ("lsh_signatures", lsh_signatures(emb, dim=64, n_tables=2, bits_per_table=4)),
        ("quantize_int8", quantize_int8(emb)),
    ]:
        plan = explain_str(frame)
        assert "Exchange" not in plan, f"{label} gained a shuffle:\n{plan[:800]}"
        assert "EvalPython" not in plan, f"{label} fell off codegen:\n{plan[:800]}"


def test_ivf_assignment_stage_shuffle_free(spark, catalog):
    """IVF corpus assignment must stay a map-only argmin over broadcast
    centroid literals — model.transform (Vector conversion) or a join
    against a centroid frame would put an Exchange or Python stage in
    the 100 TB corpus path. The k-means FIT may shuffle (it runs on a
    sample); the pin is on the assignment frame only."""
    from hustle_spark.operators.similarity import ivf_index
    from hustle_spark.plans import explain_str

    emb = catalog.table("embeddings").df.withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    assigned, centroids = ivf_index(emb, dim=8, n_lists=4)
    assert len(centroids) == 4
    plan = explain_str(assigned)
    assert "Exchange" not in plan, f"IVF assignment gained a shuffle:\n{plan[:800]}"
    assert "EvalPython" not in plan, f"IVF assignment left codegen:\n{plan[:800]}"


def test_salted_join_matches_plain_join(spark, catalog):
    li = catalog.table("lineitem").df.select("l_orderkey", "l_quantity")
    o = catalog.table("orders").df.select("o_orderkey", "o_orderpriority").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(li, o, key="l_orderkey", salt=8)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_scale_configs_shape():
    conf = scale_configs(target_partition_mb=256, cores=1000)
    assert conf["spark.sql.shuffle.partitions"] == "2000"
    assert conf["spark.sql.files.maxPartitionBytes"] == "256m"
    assert conf["spark.sql.adaptive.enabled"] == "true"


def test_scale_configs_100tb_invariants():
    """The settings the documented 100 TB story depends on, pinned as
    relationships (not just presence) so a refactor can't silently
    break the sizing math the docstrings promise."""
    mb, cores = 128, 2000
    conf = scale_configs(target_partition_mb=mb, cores=cores)
    # AQE family all on: runtime coalescing + skew-join splitting are
    # the fallback for every skew the explicit helpers don't cover
    for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
    ):
        assert conf[k] == "true", k
    # partition-size targets: scan splits, shuffle advisories, and the
    # skew threshold all derive from ONE working-set figure so a task
    # fits executor memory at any SF
    assert conf["spark.sql.files.maxPartitionBytes"] == f"{mb}m"
    assert conf["spark.sql.adaptive.advisoryPartitionSizeInBytes"] == f"{mb}m"
    assert (
        conf["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"]
        == f"{mb * 2}m"
    )
    # shuffle parallelism starts at 2x total cores (AQE coalesces down)
    assert conf["spark.sql.shuffle.partitions"] == str(cores * 2)
    # broadcast ceiling is bounded (no unbounded auto-broadcast OOM)
    assert conf["spark.sql.autoBroadcastJoinThreshold"] == "64m"
    # pushdown must stay on — the plan audits assume it
    assert conf["spark.sql.parquet.filterPushdown"] == "true"
    # runtime bloom-filter join pruning (the non-partitioned DPP
    # sibling) pinned on
    assert conf["spark.sql.optimizer.runtime.bloomFilter.enabled"] == "true"


def test_apply_scale_configs_lands_on_session(spark):
    """apply_scale_configs sets every runtime-settable conf on a LIVE
    session (static confs are skipped, not fatal) — the path a notebook
    or job driver actually uses."""
    from hustle_spark.plans.scale import apply_scale_configs, scale_configs

    # snapshot every conf the helper will touch so later tests keep
    # the session's documented local[*] shape (notably the broadcast
    # threshold, which changes join plans)
    saved = {}
    for k in scale_configs():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None  # static/unset conf
    try:
        apply_scale_configs(spark, target_partition_mb=64, cores=8)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "16"
        assert spark.conf.get("spark.sql.files.maxPartitionBytes") == "64m"
        assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
        assert (
            spark.conf.get(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
            )
            == "128m"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                continue
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # static conf, unchanged by the helper anyway


def test_catalog_delete_predicate(spark, tmp_path):
    cat = h.connect(spark, tmp_path)
    cat.create("t", ["index string date", "uint32 v"], partition="date")
    df = spark.createDataFrame(
        [("2014-01-20", 1), ("2014-01-21", 2), ("2014-01-22", 3)], "date string, v long"
    )
    cat.append("t", df)
    assert cat.partitions("t") == ["2014-01-20", "2014-01-21", "2014-01-22"]
    deleted = cat.delete("t", where=lambda d: d < "2014-01-22")
    assert deleted == ["2014-01-20", "2014-01-21"]
    assert cat.partitions("t") == ["2014-01-22"]
    assert cat.table("t").df.count() == 1


def test_dump_runs(capsys, catalog):
    from hustle_spark.table import dump

    r = catalog.table("region")
    r.dump(3)
    dump(r.df.limit(1))
    out = capsys.readouterr().out
    assert "r_name" in out


def test_bucketized_join_skips_shuffle(spark, catalog, tmp_path):
    from hustle_spark.plans import bucketize_table, explain_str

    li = catalog.table("lineitem").df.select("l_orderkey", "l_quantity")
    o = catalog.table("orders").df.select("o_orderkey", "o_orderpriority")
    bucketize_table(li, "b_lineitem", "l_orderkey", buckets=8, path=str(tmp_path / "bli"))
    bucketize_table(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", "l_orderkey", buckets=8, path=str(tmp_path / "bo"),
    )
    a = spark.table("b_lineitem")
    b = spark.table("b_orders")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = a.join(b, "l_orderkey")
        plan = explain_str(joined)
        # co-located bucketed join: SortMergeJoin with NO Exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # and it computes the same thing as the shuffled join
    plain = li.join(o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
    assert joined.count() == plain.count()
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_settings_precedence(tmp_path, monkeypatch):
    import json

    from hustle_spark.settings import load_settings

    f = tmp_path / "s.json"
    f.write_text(json.dumps({"catalog_root": "/from/file", "shuffle_partitions": 7}))
    monkeypatch.setenv("HUSTLE_CATALOG_ROOT", "/from/env")
    s = load_settings(path=f)
    assert s.catalog_root == "/from/env"        # env beats file
    assert s.shuffle_partitions == 7            # file beats default
    s2 = load_settings(path=f, catalog_root="/from/override")
    assert s2.catalog_root == "/from/override"  # override beats env
    assert s2.scratch_dir.endswith(".scratch/settings")


def test_dsl_broadcast_hint(spark, catalog):
    from hustle_spark.plans import explain_str

    li = catalog.table("lineitem")
    o = catalog.table("orders")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        no_hint = h.select(
            o.o_orderpriority, h.h_count().alias("n"),
            join=(li.l_orderkey, o.o_orderkey),
        )
        hinted = h.select(
            o.o_orderpriority, h.h_count().alias("n"),
            join=(li.l_orderkey, o.o_orderkey),
            broadcast=o,
        )
        assert "BroadcastHashJoin" not in explain_str(no_hint)
        assert "BroadcastHashJoin" in explain_str(hinted)
        assert sorted(map(tuple, no_hint.collect())) == sorted(map(tuple, hinted.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_audit_retention_single_action(spark, catalog):
    """observe-based stage accounting: counts come back correct and the
    whole chain runs as ONE job (no per-stage count() pass)."""
    from hustle_spark.plans import audit_retention

    docs = catalog.table("documents").df
    n_total = docs.count()
    n_en = docs.filter(docs.lang == "en").count()

    _, metrics = audit_retention(
        docs,
        [
            ("all", lambda d: d),
            ("en_only", lambda d: d.filter(d.lang == "en")),
            ("long_en", lambda d: d.filter(d.n_chars > 200)),
        ],
    )
    assert metrics["all"]["n_rows"] == n_total
    assert metrics["en_only"]["n_rows"] == n_en
    assert 0 < metrics["long_en"]["n_rows"] <= n_en
