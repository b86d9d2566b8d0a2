"""Spark-compat module matrix (ref python/tests/test_spark_functions.py)."""

from __future__ import annotations

import pytest

from datafusion_python_spark.api import SessionContext, col
from datafusion_python_spark.api import spark_functions as sf


@pytest.fixture(scope="module")
def ctx():
    return SessionContext()


def test_spark_fn_matrix(ctx):
    d = ctx.from_pydict(
        {"s": ["Hello", "world"], "n": [10, -3], "u": ["a%20b", "x+y"],
         "url": ["https://spark.apache.org/docs?x=1", "http://h/p?q=2"]}
    )
    out = d.select(
        sf.sha1(col("s")).alias("h1"),
        sf.sha2(col("s"), 256).alias("h2"),
        sf.xxhash64(col("s")).alias("xx"),
        sf.pmod(col("n"), sf.abs(col("n"))).alias("pm"),
        sf.hex(col("n")).alias("hx"),
        sf.base64(col("s").cast("binary")).alias("b64"),
        sf.format_string("%s/%d", col("s"), col("n")).alias("fmt"),
        sf.soundex(col("s")).alias("sx"),
        sf.parse_url(col("url"), "HOST").alias("host"),
        sf.url_decode(col("u")).alias("dec"),
        sf.if_(col("n") > 0, col("s"), sf.space(col("n") * -1)).alias("iff"),
    ).to_pydict()
    assert out["host"] == ["spark.apache.org", "h"]
    assert out["fmt"] == ["Hello/10", "world/-3"]
    assert out["pm"] == [0, 0]
    assert out["iff"][1] == "   "
    assert all(len(h) == 40 for h in out["h1"])


def test_spark_datetime_fns(ctx):
    d = ctx.from_pydict({"t": ["2024-02-15"]}).select(
        col("t").cast("date32").alias("d")
    )
    from datafusion_python_spark.api import lit

    out = d.select(
        sf.add_months(col("d"), lit(1)).alias("am"),
        sf.last_day(col("d")).alias("ld"),
        sf.next_day(col("d"), "Sunday").alias("nd"),
        sf.date_add(col("d"), lit(10)).alias("da"),
    ).to_pylist()[0]
    assert str(out["am"]) == "2024-03-15"
    assert str(out["ld"]) == "2024-02-29"
    assert str(out["nd"]) == "2024-02-18"
    assert str(out["da"]) == "2024-02-25"


def test_spark_fn_inventory():
    # the reference registers 88 spark-compat functions; ours must cover them
    assert len(sf.SPARK_FN_NAMES) >= 80, len(sf.SPARK_FN_NAMES)
