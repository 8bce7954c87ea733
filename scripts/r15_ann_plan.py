"""Build-visible plan capture for the IVF+PQ rows (r15): the registered
rows end in an eager localCheckpoint, so their .explain() is a leaf.
This captures the SEARCH plan over a freshly built index — the frame
where the build subtree's materialization strategy is visible.
Usage: python scripts/r15_ann_plan.py <tag>"""
import os, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hustle_spark.session import get_session
from hustle_spark.operators import similarity
from hustle_spark import registry
from pyspark.sql import functions as F

tag = sys.argv[1]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="ann-plan", extra_conf={"spark.ui.enabled": "false"})
e = registry._cat(spark, sf_dir).table("embeddings").df
corpus = e.select("vec_id", "embedding")
idx = similarity.build_ivf_pq_index(corpus)
out = similarity.ivf_pq_search(idx, corpus.filter(F.col("vec_id") < 5), k=5)
plan = out._sc._jvm.PythonSQLUtils.explainString(
    out._jdf.queryExecution(), "formatted")
p = Path(__file__).resolve().parents[1] / "plans" / "r15" / f"ann_ivf_pq_search_build_{tag}.txt"
p.write_text(plan)
print(f"wrote {p.name} ({len(plan)} chars)")
