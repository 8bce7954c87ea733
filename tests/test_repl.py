"""End-to-end smoke of the interactive shell (``python -m hustle_spark``),
the bin/hustle-parity surface (SURVEY.md section 3.3; VERDICT r3 missing
item #1). Drives a real subprocess through a pty with two queries and
checks the auto-dumped results — plus direct unit coverage of the
displayhook and namespace builder, which don't need a subprocess."""

from __future__ import annotations

import sys

import pytest

import hustle_spark as h


def test_repl_namespace_and_displayhook(spark, catalog, capsys):
    from hustle_spark.repl import _display, build_namespace

    ns = build_namespace(spark, catalog)
    # DSL + one variable per table
    for name in ("select", "star", "h_sum", "lineitem", "region", "catalog"):
        assert name in ns, name
    # displayhook: DataFrame auto-dumps, Table auto-dumps, scalars print,
    # None is silent, and `_` tracks the last value
    _display(ns["region"].df.select("r_name"))
    out = capsys.readouterr().out
    assert "r_name" in out and "AFRICA" in out
    _display(ns["region"])
    assert "r_regionkey" in capsys.readouterr().out
    _display(42)
    assert capsys.readouterr().out.strip() == "42"
    import builtins

    assert builtins._ == 42
    _display(None)
    assert capsys.readouterr().out == ""


def test_repl_subprocess_two_queries(tmp_path):
    pexpect = pytest.importorskip("pexpect")

    child = pexpect.spawn(
        sys.executable,
        ["-m", "hustle_spark", "/root/testdata/sf0.001", str(tmp_path / "scratch")],
        cwd="/root/repo",
        timeout=180,
        encoding="utf-8",
    )
    child.expect("tables:.*embeddings")
    child.expect(">>> ")

    # query 1: DSL select with restrict + agg; result must AUTO-dump
    # (no .show()) — the bin/hustle contract
    child.sendline(
        "select(lineitem.l_returnflag, h_sum(lineitem.l_quantity).alias('sq'),"
        " where=lineitem.l_shipdate > '1995-01-01', order_by=lineitem.l_returnflag)"
    )
    child.expect("l_returnflag")
    child.expect(">>> ")

    # query 2: star scan through the preloaded Table variable — a bare
    # Table expression must auto-dump too
    child.sendline("select(*star(region))")
    child.expect("AFRICA")
    child.expect(">>> ")
    child.sendline("region")
    child.expect("r_regionkey")
    child.expect(">>> ")

    # schema introspection, the tables()/schema()/partitions() surface
    child.sendline("print(schema('region'))")
    child.expect("r_name")
    child.expect(">>> ")
    child.sendline("print(sorted(tables()))")
    child.expect("lineitem")
    child.expect(">>> ")

    child.sendline("exit()")
    child.expect(pexpect.EOF)
    child.close()
    assert child.exitstatus == 0
