"""Count Spark jobs for one bpe_merge_rounds invocation (r15 evidence:
one action per merge round + one bookend instead of two per round).
Usage: python scripts/r15_bpe_jobs.py"""
import os, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hustle_spark.session import get_session
from hustle_spark import registry
from hustle_spark.util import release_all_persistent

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="bpe-jobs", extra_conf={"spark.ui.enabled": "false"})
qs = registry.queries()
fn = qs["bpe_merge_rounds"]
# warm once (cold JVM costs are not the object here)
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
release_all_persistent(spark)
sc = spark.sparkContext
sc.setJobGroup("bpe-count", "bpe_merge_rounds full invocation")
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
ids = sc.statusTracker().getJobIdsForGroup("bpe-count")
print(f"jobs for bpe_merge_rounds (construction + noop sink): {len(ids)}")
