"""Supplementary benchmark: the LLM-data-pipeline operator suite.

The 33-query HEADLINE in bench.py stays byte-identical across rounds
for comparability with BASELINE.md; this runner tracks the
training-data-pipeline surface (dedup, quality scoring, decontam,
snapshot/versioning, multimodal decode, export) round-over-round with
the SAME protocol (BENCH_LLM_r{N}.json beside BENCH_r{N}.json):
non-member JVM warmup first, per query one discarded cold run then
median of 3 warm runs (median-of-5 under 0.3s), noop-sink
materialization, tracked caches released between queries.

The list below is FIXED as of round 5 — append-only in later rounds,
never reorder/remove, so per-query series stay comparable.

Usage: python scripts/bench_llm.py  (env: SPARK_GRAFT_SF_DIR)
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
from hustle_spark.util import release_cached  # noqa: E402

BENCH_LLM = [
    # dedup family
    "dedup_containment_pairs",
    "dedup_pipeline_keepers",
    "dedup_repeated_spans",
    # text quality / filtering
    "boilerplate_removal",
    "text_unigram_quality",
    "text_bigram_quality",
    "bpe_merge_rounds",
    "padding_waste_buckets",
    # corpus versioning
    "corpus_diff",
    "vocab_drift_top",
    # embeddings
    "embedding_random_projection",
    "embedding_contamination_scan",
    # multimodal decode
    "multimodal_pixel_probe",
    "multimodal_audio_samples",
    "multimodal_frame_sample",
    # delivery
    "sharded_export_requery",
    # ingestion (appended round 5, after the first r5 artifact)
    "warc_ingest_records",
    # appended round 6 (append-only protocol): guarded containment,
    # color JPEG decode, URL curation
    "dedup_containment_guarded",
    "multimodal_jpeg_color_probe",
    "url_canonicalize_stats",
    "url_domain_quota",
    "multimodal_jpeg_subsampled_probe",
    # appended round 7 (append-only protocol): restart-interval JPEG,
    # within-doc repeated spans, trigram lang-id, HTML layout
    # extraction, SemDeDup
    "multimodal_jpeg_restart_probe",
    "dedup_repeated_spans_withindoc",
    "text_lang_id_trigram",
    "html_block_extract",
    "dedup_semantic",
]

WARM_RUNS = 3
EXTRA_RUNS_UNDER = 0.3
EXTRA_RUNS = 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        app_name="hustle-spark-bench-llm", extra_conf={"spark.ui.enabled": "false"}
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    qs = registry.queries()

    # warmup: documents scan + explode + shuffle + top-k — the suite's
    # dominant machinery — via a NON-member query (warming a member
    # would flatter its median; bench.py protocol)
    assert "tfidf_top_terms" not in BENCH_LLM
    try:
        for _ in range(2):
            qs["tfidf_top_terms"](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    except Exception as exc:
        print(f"bench_llm: warmup failed: {exc}", file=sys.stderr)

    per_query: dict[str, float] = {}
    for name in BENCH_LLM:
        try:
            fn = qs[name]
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times = []
            for _ in range(WARM_RUNS):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            if statistics.median(times) < EXTRA_RUNS_UNDER:
                for _ in range(EXTRA_RUNS):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    times.append(time.perf_counter() - t0)
            per_query[name] = round(statistics.median(times), 4)
        except Exception as exc:
            print(f"bench_llm: {name} failed: {exc}", file=sys.stderr)
            per_query[name] = -1.0
        finally:
            release_cached()

    total = round(sum(t for t in per_query.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "llm_pipeline_total_median_wall",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
