"""Capture a rank-ending query's plan WITH its upstream subtrees
visible. Queries that end in util.global_dense_rank localCheckpoint
their score frame for the offsets collect, so the final .explain()
starts at an ExistingRDD and hides everything upstream. For plan
evidence only, swap the rank for a lazy constant column so the whole
tree (reference scans, model aggregations, broadcast joins) stays in
one lazy plan. Results are NOT computed here.

Usage: python scripts/r14_ml_fit_plan.py <query> <tag>
Writes plans/r14/<query>_fit_<tag>.txt
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

import hustle_spark.util as U  # noqa: E402


def lazy_rank(df, cols, out):
    return df.withColumn(out, F.lit(0).cast("bigint"))


U.global_dense_rank = lazy_rank

from hustle_spark.session import get_session  # noqa: E402
from hustle_spark import registry  # noqa: E402


def main() -> None:
    name, tag = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        app_name="r14-fit-plan", extra_conf={"spark.ui.enabled": "false"}
    )
    df = registry.queries()[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out = Path(__file__).resolve().parents[1] / "plans" / "r14"
    out.mkdir(parents=True, exist_ok=True)
    (out / f"{name}_fit_{tag}.txt").write_text(plan)
    print(f"wrote {name}_fit_{tag}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
