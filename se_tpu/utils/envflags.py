"""Boolean environment-flag parsing for the kernel kill switches.

`SE_TPU_DISABLE_PALLAS_*=0` / `=false` must mean "enabled" — raw
truthiness of os.environ.get would treat any non-empty string as set
(ADVICE r2)."""

from __future__ import annotations

import os

_TRUE = ("1", "true", "yes", "on")


def env_flag(name: str, default: bool = False) -> bool:
    """True iff the env var is set to a truthy string (1/true/yes/on)."""
    val = os.environ.get(name)
    if val is None:
        return default
    return val.strip().lower() in _TRUE
