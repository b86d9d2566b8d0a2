"""arro3.core stand-in delegating to pyarrow (see package docstring)."""

import pyarrow as pa


class DataType:
    def __init__(self, patype):
        self._pa = patype

    @classmethod
    def int32(cls):
        return cls(pa.int32())

    @classmethod
    def int64(cls):
        return cls(pa.int64())

    @classmethod
    def string(cls):
        return cls(pa.string())

    @classmethod
    def float64(cls):
        return cls(pa.float64())

    def __arrow_c_schema__(self):
        return self._pa.__arrow_c_schema__()


def _pa_type(t):
    return t._pa if isinstance(t, DataType) else t


class Scalar:
    def __init__(self, value, type=None):  # noqa: A002
        self._scalar = pa.scalar(value, type=_pa_type(type))
        self._arr = pa.array([value], type=_pa_type(type))

    def as_py(self):
        return self._scalar.as_py()

    def __arrow_c_array__(self, requested_schema=None):
        return self._arr.__arrow_c_array__(requested_schema)

    def __arrow_c_schema__(self):
        return self._arr.type.__arrow_c_schema__()


class Array:
    def __init__(self, values, type=None):  # noqa: A002
        self._arr = pa.array(values, type=_pa_type(type))

    def __getitem__(self, i):
        return self._arr[i]

    def __len__(self):
        return len(self._arr)

    def __arrow_c_array__(self, requested_schema=None):
        return self._arr.__arrow_c_array__(requested_schema)

    def __arrow_c_schema__(self):
        return self._arr.type.__arrow_c_schema__()
