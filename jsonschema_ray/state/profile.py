"""Baseline profile persistence (drift-check reference state).

FIXTURES.md F3: a JSON file of per-column
``{count, null_rate, min, max, hll, tdigest}`` captured from a known-
good generation; the drift rule compares a fresh profile's t-digest
quantiles against it (pipelines/stats.py:check_drift). The analog of
the reference's lock-file reproducibility state
(``/root/reference/src/command_install.cc:388-465``) applied to data.
"""

from __future__ import annotations

import json
import os
from typing import Any


def save_profile(path: str, profile: dict[str, dict[str, Any]]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(profile, f, sort_keys=True, indent=1)
    os.replace(tmp, path)  # atomic, like the reference's atomic_write_file


def load_profile(path: str) -> dict[str, dict[str, Any]]:
    with open(path) as f:
        return json.load(f)
