"""Regenerate docs/query_hashes.json — the per-query content manifest
backing tests/test_window_invariant.py.

Each entry is md5(query function source + oracle SQL).  The manifest is
regenerated DELIBERATELY, only when the driver window has been rotated
to cover every changed query: running this script is the act of saying
"the current window ordering accounts for the current query bodies".
Editing a query without re-running this script (and promoting the query
into the first-50 window) fails pytest — that is the guardrail against
the round-2 process bug where two edited queries sat at positions 51-52
and escaped driver re-verification.

Usage: python scripts/update_query_hashes.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hustle_spark.registry import query_content_hashes  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "docs" / "query_hashes.json"


def main():
    hashes = query_content_hashes()
    OUT.write_text(json.dumps(hashes, indent=1, sort_keys=True) + "\n")
    print(f"wrote {len(hashes)} hashes to {OUT}")


if __name__ == "__main__":
    main()
