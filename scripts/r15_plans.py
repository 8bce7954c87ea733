"""Capture .explain('formatted') artifacts for the r15 optimization
round: plans/r15/<query>_<tag>.txt for each named query.

Usage: python scripts/r15_plans.py <tag> <query> [query ...]
       python scripts/r15_plans.py <tag> --all-headline
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hustle_spark.session import get_session  # noqa: E402
from hustle_spark import registry  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        app_name="r15-plans", extra_conf={"spark.ui.enabled": "false"}
    )
    qs = registry.queries()
    if names == ["--all-headline"]:
        import bench

        names = list(bench.HEADLINE)
    out_dir = Path(__file__).resolve().parents[1] / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc}\n"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
