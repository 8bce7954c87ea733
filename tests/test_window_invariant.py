"""Window-sort invariant (VERDICT.md r2, "Next round" #3).

The correctness driver verifies only the FIRST 50 entries of
``queries()``.  Round 2 edited two queries but left them at positions
51-52, so the changed code was never driver-re-verified.  This test
makes that class of mistake a pytest failure:

* docs/query_hashes.json records md5(source + oracle) per query as of
  the last deliberate window rotation (scripts/update_query_hashes.py).
* Any query whose CURRENT hash differs from the manifest — or which is
  absent from the manifest (i.e. new) — must sit inside the first-50
  driver window.

Re-running scripts/update_query_hashes.py is the deliberate act of
declaring the window rotation complete; doing so without promoting a
changed query still trips the segment checks below.
"""

import json
from pathlib import Path

from hustle_spark import registry

MANIFEST = Path(__file__).resolve().parents[1] / "docs" / "query_hashes.json"
WINDOW = 50


def test_manifest_exists_and_covers_registry():
    stored = json.loads(MANIFEST.read_text())
    current = registry.query_content_hashes()
    # Every stored name must still exist (no silent deletions leaving a
    # stale manifest), modulo deliberate removals which must regenerate.
    gone = set(stored) - set(current)
    assert not gone, f"manifest names no longer registered: {sorted(gone)}"


def test_changed_or_new_queries_sit_in_driver_window():
    stored = json.loads(MANIFEST.read_text())
    current = registry.query_content_hashes()
    window = set(registry._ordered()[:WINDOW])
    out_of_window = [
        name
        for name, h in current.items()
        if stored.get(name) != h and name not in window
    ]
    assert not out_of_window, (
        "queries changed (or added) since docs/query_hashes.json was "
        f"regenerated but NOT promoted into the first-{WINDOW} driver "
        f"window: {sorted(out_of_window)} — add them to _NEW_THIS_ROUND "
        "/ _CHANGED in hustle_spark/registry.py, then re-run "
        "scripts/update_query_hashes.py"
    )


def test_window_is_exactly_fifty_and_all_priority_present():
    ordered = registry._ordered()
    assert len(ordered) == len(set(ordered)), "duplicate names in ordering"
    window = ordered[:WINDOW]
    head = registry._CHANGED + registry._NEW_THIS_ROUND
    assert len(head) <= WINDOW
    assert window[: len(head)] == head, (
        "priority segments must occupy the window head in order"
    )
    # Window must be full as long as enough queries exist.
    assert len(ordered) >= WINDOW
    assert len(set(window)) == WINDOW


def test_priority_segments_disjoint():
    segs = [registry._CHANGED, registry._NEW_THIS_ROUND, registry._BACKFILL]
    flat = [n for s in segs for n in s]
    assert len(flat) == len(set(flat)), "a query appears in two segments"


def test_doc_query_counts_match_registry():
    """Count-drift guard (VERDICT r3 "What's wrong" #2 hit this twice):
    the registry count stated in README.md and SURVEY.md must equal the
    actual registry. One number, three places, structurally enforced."""
    import re

    root = Path(__file__).resolve().parents[1]
    total = len(registry.QUERIES)
    oracle_bound = sum(1 for q in registry.QUERIES.values() if q.oracle)

    readme = (root / "README.md").read_text()
    m = re.search(r"registry\.py\s+(\d+) named queries", readme)
    assert m and int(m.group(1)) == total, (
        f"README.md says {m and m.group(1)} queries, registry has {total}"
    )
    m = re.search(r"\((\d+) oracle-checked", readme)
    assert m and int(m.group(1)) == oracle_bound, (
        f"README.md says {m and m.group(1)} oracle-checked, "
        f"registry has {oracle_bound}"
    )

    survey = (root / "SURVEY.md").read_text()
    m = re.search(r"(\d+) registry queries after round", survey)
    assert m and int(m.group(1)) == total, (
        f"SURVEY.md says {m and m.group(1)} queries, registry has {total}"
    )
