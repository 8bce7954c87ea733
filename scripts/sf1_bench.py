"""sf1-equivalent scaling bench: synthesize a 10x copy of the sf0.1
testdata (key-shifted unions, join-consistent), run the headline bench
at both scales in fresh JVMs, and print the per-query scaling table for
BASELINE.md.

At sf0.1 every headline query is overhead-dominated (~0.15 s Spark job
floor), so the bench alone cannot distinguish a good plan from a lucky
one; the 10x run exposes super-linear behavior (candidate-pair
explosions, unpruned scans, accidental sorts). Data is 10x, so a
healthy ratio is <= ~10 for scan-bound queries and ~1-3 for
overhead-bound ones; anything well above 10 gets a plan audit.

    python scripts/sf1_bench.py [--regen] [--out BENCH_sf1_rNN.json]

With --out, the run is recorded as a per-round artifact (VERDICT r2
#5): both scales' per-query medians plus the ratio table, so plan
regressions show up round-over-round as ratio changes rather than
sf0.1 noise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SRC = "/root/testdata/sf0.1"
DST = Path("/root/repo/.scratch/sf1")
FACTOR = 10

# per-table key columns to shift per replica; strides come from the
# key's home table so foreign keys stay join-consistent
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
HOME_KEY = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
COPY = ["region", "nation"]


def gen(regen: bool = False) -> None:
    from pyspark.sql import functions as F

    from hustle_spark.catalog import Catalog
    from hustle_spark.session import get_session

    if DST.exists() and not regen:
        print(f"scaled data already at {DST} (use --regen to rebuild)")
        return
    spark = get_session(
        app_name="sf1-gen",
        extra_conf={
            "spark.ui.enabled": "false",
            # write plain micros so readers don't hit the nanos path
            "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        },
    )
    cat = Catalog(spark, SRC, scratch="/root/repo/.scratch/sf1_gen")
    DST.mkdir(parents=True, exist_ok=True)

    strides: dict[tuple[str, str], int] = {}
    for tbl, col in set(HOME_KEY.values()):
        strides[(tbl, col)] = (
            cat.table(tbl).df.agg(F.max(col)).collect()[0][0] + 1
        )

    for tbl in COPY:
        cat.table(tbl).df.write.mode("overwrite").parquet(str(DST / f"{tbl}.parquet"))
        print(f"  {tbl}: copied")
    for tbl, cols in SHIFT.items():
        df = cat.table(tbl).df
        parts = []
        for i in range(FACTOR):
            rep = df
            for c in cols:
                stride = strides[HOME_KEY[c]]
                rep = rep.withColumn(c, F.col(c) + F.lit(i * stride))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(str(DST / f"{tbl}.parquet"))
        print(f"  {tbl}: x{FACTOR}")
    spark.stop()


def run_bench(sf_dir: str) -> dict:
    # --runner llm switches the measured suite to the LLM-pipeline
    # bench (scripts/bench_llm.py) with the same two-fresh-JVM protocol
    runner = "/root/repo/bench.py"
    if "--runner" in sys.argv and sys.argv[sys.argv.index("--runner") + 1] == "llm":
        runner = "/root/repo/scripts/bench_llm.py"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, runner],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench at {sf_dir} produced no JSON:\n{out.stderr[-2000:]}")


def main() -> None:
    gen(regen="--regen" in sys.argv)
    base = run_bench(SRC)
    print(f"sf0.1 total: {base['value']}s")
    scaled = run_bench(str(DST))
    print(f"sf1 total: {scaled['value']}s")

    # pair-output dedup queries are excluded from the super-linear flag:
    # the key-shifted replication makes every doc a FACTOR-copy identical
    # clique, so their true pair OUTPUT grows quadratically by
    # construction (measured 102x pairs on 10x input — BASELINE.md);
    # flagging them every run would bury a real plan regression
    PAIR_OUTPUT = {
        "dedup_simhash", "dedup_minhash_lsh",
        # llm runner: same clique artifact — the key-shifted replicas are
        # FACTOR-copy identical texts, so candidate-pair stages grow
        # quadratically by construction on this synthetic copy
        "dedup_containment_pairs", "dedup_pipeline_keepers",
    }

    print("\n| query | sf0.1 s | sf1 s | ratio (10x data) |")
    print("|---|---|---|---|")
    flagged = []
    ratios: dict[str, float] = {}
    for name, t0 in base["queries"].items():
        t1 = scaled["queries"].get(name, -1.0)
        ratio = round(t1 / t0, 1) if t0 > 0 and t1 > 0 else float("nan")
        if ratio == ratio:
            ratios[name] = ratio
        hot = ratio == ratio and ratio > 12 and name not in PAIR_OUTPUT
        if hot:
            flagged.append(name)
        note = " **super-linear**" if hot else (
            " (pair-output: quadratic by construction)" if name in PAIR_OUTPUT and ratio == ratio and ratio > 12 else ""
        )
        print(f"| {name} | {t0} | {t1} | {ratio}{note} |")
    total_ratio = round(scaled["value"] / base["value"], 2)
    print(f"\ntotal ratio: {total_ratio} (10x data; <=10 is at-most-linear)")
    if flagged:
        print(f"plan-audit these (ratio > 12): {', '.join(flagged)}")

    # dead-reading guard (VERDICT r8 directive #3 — THE r8 incident was
    # exactly here: an OOM'd JVM wrote -1.0 tails and this artifact
    # published a fictitious ratio over the survivors). Any negative
    # per-query value, or an inner bench that declared itself invalid,
    # poisons the whole artifact and withholds the headline ratio.
    from bench import validate_artifact
    dead = validate_artifact(
        {}, [base.get("queries"), scaled.get("queries")]
    )
    is_valid = (
        dead["valid"]
        and base.get("valid", True)
        and scaled.get("valid", True)
    )
    if not is_valid:
        print(
            "INVALID RUN: dead per-query readings "
            f"{dead.get('invalid_queries', [])} — ratios withheld",
            file=sys.stderr,
        )

    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    if out_path:
        artifact = {
            "metric": "sf1_scaling_study",
            "factor": FACTOR,
            "sf01_total_sec": base["value"],
            "sf1_total_sec": scaled["value"],
            "total_ratio": total_ratio if is_valid else None,
            "sf01_queries": base["queries"],
            "sf1_queries": scaled["queries"],
            "ratios": ratios if is_valid else {},
            "pair_output_excluded": sorted(PAIR_OUTPUT),
            "flagged_super_linear": flagged,
            "valid": is_valid,
        }
        if not is_valid:
            artifact["invalid_queries"] = dead.get("invalid_queries", [])
        Path(out_path).write_text(json.dumps(artifact, indent=1) + "\n")
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
