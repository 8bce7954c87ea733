"""Dead-reading bench guard (VERDICT r8 directive #3): an artifact fed
a -1.0 tail — the signature of a query that crashed the JVM and failed
every later query — must be rejected (``valid: false`` + the failing
names), never published as a fast run. The r8 sf1 LLM bench once
recorded exactly that: an OOM at dedup_substring_groups@sf1 wrote -1.0
tails and the artifact published a fictitious 1.17 ratio over the
seven surviving rows."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import validate_artifact  # noqa: E402


def test_minus_one_tail_rejects_artifact():
    per_query = {"q1": 1.23, "q2": 0.5, "dedup_substring_groups": -1.0,
                 "later_query": -1.0}
    sentinel = {"q4": 0.6, "q7": 0.7, "q14": 0.3}
    artifact = {"metric": "m", "value": 1.73}
    validate_artifact(artifact, [per_query, sentinel])
    assert artifact["valid"] is False
    assert artifact["invalid_queries"] == [
        "dedup_substring_groups", "later_query"
    ]


def test_dead_sentinel_rejects_artifact():
    artifact = validate_artifact(
        {}, [{"q1": 1.0}, {"q4": -1.0}]
    )
    assert artifact["valid"] is False
    assert artifact["invalid_queries"] == ["q4"]


def test_clean_artifact_is_valid():
    artifact = validate_artifact(
        {"value": 2.0}, [{"q1": 1.0, "q2": 1.0}, {"q4": 0.5}]
    )
    assert artifact["valid"] is True
    assert "invalid_queries" not in artifact


def test_empty_and_none_maps_are_valid():
    # sf1_bench calls with .get() results that may be None
    artifact = validate_artifact({}, [None, {}])
    assert artifact["valid"] is True
