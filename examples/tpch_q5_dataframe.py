"""Reference-style example (cf. examples/tpch/q05_local_supplier_volume.py
in apache/datafusion-python): local supplier volume in the DataFrame API.

Run: python examples/tpch_q5_dataframe.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from datafusion_python_spark.api import SessionContext, col, functions as f

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ctx = SessionContext()
for t in ("region", "nation", "customer", "supplier", "orders", "lineitem"):
    ctx.register_parquet(t, f"{sf_dir}/{t}.parquet")

region = ctx.table("region").filter(col("r_name") == "ASIA")
orders = ctx.table("orders").filter(
    (col("o_orderdate") >= f.lit("1996-01-01").cast("timestamp"))
    & (col("o_orderdate") < f.lit("1997-01-01").cast("timestamp"))
)
revenue = (
    ctx.table("lineitem")
    .join(orders, left_on="l_orderkey", right_on="o_orderkey")
    .join(ctx.table("customer"), left_on="o_custkey", right_on="c_custkey")
    .join_on(ctx.table("supplier"),
             col("l_suppkey") == col("s_suppkey"),
             col("c_nationkey") == col("s_nationkey"))
    .join(ctx.table("nation"), left_on="s_nationkey", right_on="n_nationkey")
    .join(region, left_on="n_regionkey", right_on="r_regionkey")
    .aggregate([col("n_name")], [f.sum(col("l_extendedprice") * (1 - col("l_discount"))).alias("revenue")])
    .sort(col("revenue").sort(ascending=False))
)
revenue.show()
