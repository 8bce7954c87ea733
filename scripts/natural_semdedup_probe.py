"""Natural-corpus scaling probe for dedup_semantic_centroid (VERDICT
r10 directive #5 — the substr-probe treatment for SemDeDup).

The sf1/sf100 replica corpora copy every EMBEDDING verbatim, so sign
clusters accumulate identical replicas: within-cluster dominance pairs
grow quadratically with the replication factor by construction, and
the measured sf1 ratio (4.3 in r10) conflates that fixture artifact
with the operator's cost curve. No real corpus grows new 10-deep
identical-embedding cliques when it grows 10x.

This probe builds a corpus shaped like real embedding data:

  - every replica's vector is DECORRELATED deterministically (circular
    dimension shift by replica index, sign-flipped on wrap), so
    replicas land in different sign orthants the way independent
    documents do;
  - ~10% of base rows (vec_id % 10 == 0) plant a NEAR-DUP twin
    (0.97x scale + one nudged dimension -> cosine ~0.999 to its
    source), so the dedup has real work at every scale;
  - everything else is untouched.

It runs the EXACT chain the registry row runs (adaptive_sign_bits on
the live count -> sign_quantize -> semantic_dedup_centroid at 0.30)
at 1x / 10x / 100x, and records wall medians, the ratio ladder, the
CLUSTER-SIZE distribution (mean/p99/max — the quantity the adaptive
quantizer is supposed to hold flat), and the kept fraction. One JSON
line for BASELINE.md.

    python scripts/natural_semdedup_probe.py [--factors 10,100]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SRC = "/root/testdata/sf0.1"
DIM = 64
TWIN_MOD = 10  # vec_id % 10 == 0 -> plants a near-dup twin


def build_corpus(spark, factor: int):
    """factor replicas of the sf0.1 embeddings, decorrelated per
    replica, plus ~10% planted near-dup twins of replica 0."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SRC}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).filter(F.col("embedding").isNotNull())
    stride = e.agg(F.max("vec_id")).collect()[0][0] + 1

    parts = []
    for i in range(factor):
        shift = i % DIM
        flip = -1.0 if (i // DIM) % 2 == 1 else 1.0
        rep = e.select(
            (F.col("vec_id") + F.lit(i * stride)).alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {DIM - 1}), "
                f"j -> element_at(embedding, (j + {shift}) % {DIM} + 1) "
                f"* {flip}D)"
            ).alias("embedding"),
        )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)

    # planted near-dups: twin of each (vec_id % TWIN_MOD == 0) base row,
    # ids placed AFTER all replicas so they never collide
    twin_base = factor * stride
    twins = e.filter(F.col("vec_id") % TWIN_MOD == 0).select(
        (F.col("vec_id") + F.lit(twin_base)).alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), "
            f"j -> element_at(embedding, j + 1) * 0.97D "
            f"+ if(j = 0, 0.01D, 0D))"
        ).alias("embedding"),
    )
    return out.unionByName(twins)


def run_leg(spark, factor: int, runs: int = 3) -> dict:
    from pyspark.sql import functions as F

    from hustle_spark.operators import similarity
    from hustle_spark.util import release_all_persistent

    corpus = build_corpus(spark, factor)
    corpus.write.mode("overwrite").parquet(
        f"/root/repo/.scratch/natsem/f{factor}.parquet"
    )
    dbl = spark.read.parquet(f"/root/repo/.scratch/natsem/f{factor}.parquet")
    n = dbl.count()
    nb = similarity.adaptive_sign_bits(n)

    def once() -> tuple[float, int]:
        t0 = time.monotonic()
        assigned = similarity.sign_quantize(dbl, n_bits=nb)
        out = similarity.semantic_dedup_centroid(assigned, threshold=0.30)
        kept = out.filter(F.col("kept")).count()
        wall = time.monotonic() - t0
        release_all_persistent(spark)
        return wall, kept

    walls, kept = [], 0
    once()  # discard cold
    for _ in range(runs):
        w, kept = once()
        walls.append(w)

    # cluster-size distribution — the adaptive quantizer's contract
    assigned = similarity.sign_quantize(dbl, n_bits=nb)
    sizes = assigned.groupBy("list_id").count()
    dist = sizes.agg(
        F.mean("count").alias("mean"),
        F.expr("percentile(count, 0.99)").alias("p99"),
        F.max("count").alias("max"),
        F.count("*").alias("n_clusters"),
    ).collect()[0]
    return {
        "factor": factor,
        "rows": n,
        "n_bits": nb,
        "wall_median_sec": round(statistics.median(walls), 3),
        "kept_fraction": round(kept / n, 4),
        "cluster_mean": round(float(dist["mean"]), 1),
        "cluster_p99": round(float(dist["p99"]), 1),
        "cluster_max": int(dist["max"]),
        "n_clusters": int(dist["n_clusters"]),
    }


def main() -> None:
    factors = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--factors"):
            factors = [1] + [
                int(x) for x in a.split("=", 1)[1].split(",")
            ]
    from hustle_spark.session import get_session

    spark = get_session(
        app_name="natural-semdedup-probe",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    legs = [run_leg(spark, f) for f in factors]
    base = legs[0]["wall_median_sec"]
    result = {
        "metric": "natural_semdedup_probe",
        "legs": legs,
        "ratios": {
            f"x{leg['factor']}": round(leg["wall_median_sec"] / base, 2)
            for leg in legs[1:]
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
