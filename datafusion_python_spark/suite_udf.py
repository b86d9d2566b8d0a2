"""UDF/UDAF gate queries.

Exercises the reference's user-defined-aggregate contract (ref
python/datafusion/user_defined.py:358-706: Accumulator with
state/update/merge/evaluate, callable column-position inside
``DataFrame.aggregate``) through this package's applyInPandas-backed
emulation. The oracle recomputes the geometric mean exactly in SQL
(exp(avg(ln(x)))), so this is a full value-hash gate, not rows-only.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from .tables import load_table


class GeoMean:
    """Geometric-mean accumulator (Accumulator contract, duck-typed)."""

    def __init__(self) -> None:
        self.n = 0
        self.log_sum = 0.0

    def state(self) -> list:
        return [self.n, self.log_sum]

    def update(self, values) -> None:
        import pyarrow.compute as pc

        valid = values.drop_null()
        self.n += len(valid)
        if len(valid):
            s = pc.sum(pc.ln(pc.cast(valid, "float64"))).as_py()
            self.log_sum += s or 0.0

    def merge(self, states: list) -> None:
        for n, log_sum in states:
            self.n += n
            self.log_sum += log_sum

    def evaluate(self):
        return math.exp(self.log_sum / self.n) if self.n else None


def udaf_geomean(spark, sf_dir):
    from .api.dataframe import DataFrame
    from .api.expr import Expr, col
    from .api.udf import udaf

    li = load_table(spark, sf_dir, "lineitem")
    gm = udaf(GeoMean, ["double"], "double", name="geomean")
    out = DataFrame(li).aggregate(
        [col("l_returnflag")],
        [
            gm(col("l_extendedprice")).alias("gm_price"),
            Expr(F.count(F.lit(1)).alias("n")),
        ],
    )
    return out.df.select(
        "l_returnflag", F.round("gm_price", 2).alias("gm_price"), "n"
    ).orderBy("l_returnflag")


UDAF_GEOMEAN_SQL = """
SELECT l_returnflag,
       round(exp(avg(ln(l_extendedprice))), 2) AS gm_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


UDF_QUERIES: dict[str, tuple] = {
    "udaf_geomean": (udaf_geomean, UDAF_GEOMEAN_SQL),
}
