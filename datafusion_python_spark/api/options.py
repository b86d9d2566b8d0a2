"""File-format read options module (reference: python/datafusion/options.py).

The reference exposes ``CsvReadOptions`` from a dedicated ``options``
module; the implementation here lives in :mod:`.config` (it shares the
builder conventions of ``SessionConfig``). This module mirrors the
reference's import path: ``from datafusion_python_spark import options``.
"""

from __future__ import annotations

from .config import CsvReadOptions

__all__ = ["CsvReadOptions"]

DEFAULT_MAX_INFER_SCHEMA = 1000


def validate_single_character(name: str, value) -> None:
    """Raise unless ``value`` is a single character (ref
    options.py validate_single_character)."""
    if value is not None and (not isinstance(value, str) or len(value) != 1):
        raise ValueError(f"{name} must be a single character, got {value!r}")
