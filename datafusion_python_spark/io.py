"""IO convenience functions (ref python/datafusion/io.py).

Each reads with a default-session context; identical to calling the
same method on a :class:`.SessionContext` you manage yourself.
"""

from __future__ import annotations


def read_parquet(path, *args, **kwargs):
    """Read a parquet file/directory into a DataFrame (ref io.py:37)."""
    from . import read_parquet as _f

    return _f(path, *args, **kwargs)


def read_json(path, *args, **kwargs):
    """Read newline-delimited JSON (ref io.py:83)."""
    from . import read_json as _f

    return _f(path, *args, **kwargs)


def read_csv(path, *args, **kwargs):
    """Read CSV (ref io.py:122)."""
    from . import read_csv as _f

    return _f(path, *args, **kwargs)


def read_avro(path, *args, **kwargs):
    """Read an Avro object-container file (ref io.py:172)."""
    from . import read_avro as _f

    return _f(path, *args, **kwargs)


__all__ = ["read_avro", "read_csv", "read_json", "read_parquet"]
