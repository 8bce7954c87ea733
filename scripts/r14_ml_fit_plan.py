"""Capture the moore_lewis_scores plan WITH the model-fit subtrees
visible. The production query ends in util.global_dense_rank, whose
offsets collect localCheckpoints the score frame — the final
.explain() therefore starts at an ExistingRDD and hides the fit.
For plan evidence only, swap the rank for a lazy constant column so
the whole tree (reference-slice scans, model aggregations, broadcast
joins) stays in one lazy plan. Results are NOT computed here.

Usage: python scripts/r14_ml_fit_plan.py <tag>
Writes plans/r14/data_selection_moore_lewis_fit_<tag>.txt
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
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        app_name="r14-ml-fit-plan", extra_conf={"spark.ui.enabled": "false"}
    )
    df = registry.queries()["data_selection_moore_lewis"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out = Path(__file__).resolve().parents[1] / "plans" / "r14"
    out.mkdir(parents=True, exist_ok=True)
    (out / f"data_selection_moore_lewis_fit_{tag}.txt").write_text(plan)
    print(f"wrote data_selection_moore_lewis_fit_{tag}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
