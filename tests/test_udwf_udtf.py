"""UDWF emulation + Python UDTF (ref test_udwf.py / test_udtf.py shapes)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from datafusion_python_spark.api import SessionContext, WindowEvaluator, udtf, udwf


@pytest.fixture(scope="module")
def ctx():
    return SessionContext()


def test_udwf_exponential_smooth(ctx):
    # the reference's canonical UDWF example: exponential smoothing
    class ExpSmooth(WindowEvaluator):
        def __init__(self, alpha=0.5):
            self.alpha = alpha

        def evaluate_all(self, values, num_rows):
            col = values[0]
            out, prev = [], None
            for v in col.to_pylist():
                prev = v if prev is None else self.alpha * v + (1 - self.alpha) * prev
                out.append(prev)
            return pa.array(out, type=pa.float64())

    d = ctx.from_pydict(
        {"g": ["a", "a", "a", "b", "b"], "o": [1, 2, 3, 1, 2], "v": [1.0, 3.0, 5.0, 10.0, 20.0]}
    )
    smooth = udwf(ExpSmooth, ["float64"], "float64")
    out = smooth.apply(d, ["g"], ["o"], ["v"], "s").sort("g", "o").to_pydict()
    assert out["s"] == [1.0, 2.0, 3.5, 10.0, 15.0]


def test_udtf_expand(ctx):
    @udtf(return_type="x int, sq int")
    class Squares:
        def eval(self, n: int):
            for i in range(n):
                yield (i, i * i)

    ctx.register_udtf(Squares)
    out = ctx.sql("SELECT * FROM Squares(4)").to_pydict()
    assert out == {"x": [0, 1, 2, 3], "sq": [0, 1, 4, 9]}
