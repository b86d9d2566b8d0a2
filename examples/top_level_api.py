"""Reference-style usage through the top-level package — the imports a
datafusion-python user would change (`datafusion` →
`datafusion_python_spark`) and nothing else.

Run: python examples/top_level_api.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datafusion_python_spark as dfn
from datafusion_python_spark import SessionConfig, SessionContext, col, functions as f, lit

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# session with builder config, reference-style
ctx = SessionContext(SessionConfig().with_target_partitions(16))

# module-level read + expression API
orders = dfn.read_parquet(f"{sf_dir}/orders.parquet")
top = (
    orders.filter(col("o_totalprice") > lit(100_000.0))
    .aggregate([col("o_orderpriority")], [f.count(lit(1)).alias("n")])
    .sort(col("o_orderpriority").sort())
)
print(top.to_pandas())

# SQL with recursive CTE + COPY TO
ctx.register_parquet("orders", f"{sf_dir}/orders.parquet")
print(
    ctx.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t WHERE n < 3) "
        "SELECT n FROM t ORDER BY n"
    ).to_pylist()
)
ctx.sql("COPY (SELECT o_orderkey, o_totalprice FROM orders LIMIT 100) TO '/tmp/copied.parquet'")

# record-batch streaming export (bounded driver memory)
stream = top.execute_stream(rows_per_batch=2)
print("batches:", sum(1 for _ in stream))

# UDAF callable inside aggregate()
import math

import pyarrow.compute as pc


class Mean:
    def __init__(self):
        self.n, self.s = 0, 0.0

    def state(self):
        return [self.n, self.s]

    def update(self, arr):
        v = arr.drop_null()
        self.n += len(v)
        self.s += pc.sum(pc.cast(v, "float64")).as_py() or 0.0

    def merge(self, states):
        for n, s in states:
            self.n += n
            self.s += s

    def evaluate(self):
        return self.s / self.n if self.n else None


my_mean = dfn.udaf(Mean, ["double"], "double", name="my_mean")
print(
    orders.aggregate([], [my_mean(col("o_totalprice")).alias("mean_price")]).to_pylist()
)

# plan introspection
print(dfn.LogicalPlan(top).display().splitlines()[0])
