"""Engine settings — the reference's ``Settings`` analogue.

Reference (public repo: ``hustle/core/settings.py`` [M]): a dict-like
object merging defaults, ``/etc/hustle/settings.yaml``, and call-site
overrides (DDFS master URL, worker counts...). Here the knobs that
matter are the catalog root, scratch dir, and Spark conf overrides;
sources are defaults < JSON settings file < environment < overrides.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

DEFAULTS: dict[str, Any] = {
    "catalog_root": "/root/testdata/sf0.001",
    "scratch_dir": "/root/repo/.scratch/settings",
    "shuffle_partitions": None,   # None -> session default
    "spark_conf": {},             # extra SparkSession conf
}

ENV_PREFIX = "HUSTLE_"
SETTINGS_FILE_ENV = "HUSTLE_SETTINGS_FILE"


class Settings(dict):
    """dict with attribute access, like the reference's Settings."""

    def __getattr__(self, item: str) -> Any:
        try:
            return self[item]
        except KeyError as e:
            raise AttributeError(item) from e


def load_settings(path: str | Path | None = None, **overrides: Any) -> Settings:
    """defaults < settings file (JSON) < HUSTLE_* env < overrides."""
    merged: dict[str, Any] = dict(DEFAULTS)
    file_path = path or os.environ.get(SETTINGS_FILE_ENV)
    if file_path and Path(file_path).exists():
        merged.update(json.loads(Path(file_path).read_text()))
    for key in DEFAULTS:
        env_val = os.environ.get(ENV_PREFIX + key.upper())
        if env_val is not None:
            merged[key] = env_val
    merged.update({k: v for k, v in overrides.items() if v is not None})
    return Settings(merged)


def connect_from_settings(settings: Settings | None = None):
    """One-call bootstrap: session + catalog from settings (the
    reference REPL's startup path)."""
    from .catalog import connect
    from .session import get_session

    s = settings or load_settings()
    sp = int(s["shuffle_partitions"]) if s.get("shuffle_partitions") else None
    spark = get_session(shuffle_partitions=sp, extra_conf=dict(s.get("spark_conf") or {}))
    return connect(spark, s["catalog_root"], scratch=s["scratch_dir"])
