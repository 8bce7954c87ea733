"""Back-compat shim: the REPL moved into the package (round 4).

    python -m hustle_spark [catalog_dir]    # the real entry point
    python scripts/repl.py [catalog_dir]    # still works via this shim
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hustle_spark.repl import main  # noqa: E402

if __name__ == "__main__":
    main()
