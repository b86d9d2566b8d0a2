"""Minimal stand-in for the ``nanoarrow`` package (not installed in
this environment). The reference's tests use only
``nanoarrow.Array(values, type)[i]`` / ``nanoarrow.int32()`` to hand
Arrow-protocol objects to ``lit``; this shim delegates to pyarrow and
exposes the same Arrow PyCapsule surface, so what's exercised is this
package's capsule ingestion — not nanoarrow itself.
"""

import pyarrow as pa


def int32():
    return pa.int32()


def int64():
    return pa.int64()


def string():
    return pa.string()


def float64():
    return pa.float64()


class Array:
    def __init__(self, values, type=None):  # noqa: A002
        self._arr = pa.array(values, type=type)

    def __getitem__(self, i):
        return self._arr[i]

    def __len__(self):
        return len(self._arr)

    def __arrow_c_array__(self, requested_schema=None):
        return self._arr.__arrow_c_array__(requested_schema)

    def __arrow_c_schema__(self):
        return self._arr.type.__arrow_c_schema__()
