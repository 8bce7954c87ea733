"""Time individual registry queries under the bench protocol (one
discarded cold run, then median of 3 warm runs, noop sink, tracked
caches released between queries) — the A/B instrument for optimization
rounds. Not a driver artifact; bench.py / bench_llm.py stay the
artifacts of record.

Usage: python scripts/time_query.py <query> [query ...]
       (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, WARM_RUNS)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hustle_spark.session import get_session  # noqa: E402
from hustle_spark import registry  # noqa: E402
from hustle_spark.util import release_all_persistent  # noqa: E402

WARM_RUNS = int(os.environ.get("WARM_RUNS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        app_name="time-query", extra_conf={"spark.ui.enabled": "false"}
    )
    qs = registry.queries()
    # non-member JVM warmup (same as bench.py)
    for _ in range(2):
        qs["q4_order_priority"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    out: dict[str, float] = {}
    for name in sys.argv[1:]:
        try:
            fn = qs[name]
            spark.sparkContext.setJobDescription(f"time:{name}:cold")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times = []
            for i in range(WARM_RUNS):
                spark.sparkContext.setJobDescription(f"time:{name}:warm{i}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            out[name] = round(statistics.median(times), 4)
            print(f"TIMED {name}: {out[name]} {[round(t, 3) for t in times]}",
                  file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            print(f"FAILED {name}: {exc}", file=sys.stderr)
            out[name] = -1.0
        finally:
            release_all_persistent(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
