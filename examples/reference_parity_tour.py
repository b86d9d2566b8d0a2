"""One runnable tour replaying the API pattern of every script in the
reference's ``examples/`` directory (ref examples/README.md listing) —
the migration check: each section is what that reference example does,
with the import switched to this package and asserts on the results.

  create-context.py      → SessionContext / SessionConfig builders
  export.py / import.py  → to_pylist/to_pydict/to_pandas/to_arrow + from_*
  query-pyarrow-data.py  → register_record_batches over pa.RecordBatch
  array-operations.py    → make_array / array_agg(distinct, filter) / HOFs
  sql-parquet.py         → register_parquet + SQL
  dataframe-parquet.py   → read_parquet → write_parquet round trip
  csv-read-options.py    → read_csv(schema / delimiter / header)
  sql-to-pandas.py       → ctx.sql(...).to_pandas()
  python-udf.py          → udf over pa.Array
  python-udaf.py         → udaf Accumulator in aggregate()
  sql-using-python-udf/udaf.py → register_udf / register_udaf + SQL
  python-udwf.py         → udwf WindowEvaluator
  multiprocessing_pickle_expr.py / ray_pickle_expr.py → Expr/plan ship
  substrait.py           → Serde round-trip + Consumer execute + unparse
  sql-parquet-s3.py      → register_object_store config shim
  tpch/                  → suite_tpch (all 22, oracle-gated)

Run: python examples/reference_parity_tour.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

from datafusion_python_spark import (
    SessionConfig,
    SessionContext,
    col,
    functions as f,
    lit,
    udf,
    udaf,
)
from datafusion_python_spark.api.udf import Accumulator

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# -- create-context.py ------------------------------------------------------
ctx = SessionContext(
    SessionConfig().with_target_partitions(8).with_batch_size(4096)
)

# -- export.py / import.py --------------------------------------------------
df = ctx.from_pydict({"a": [1, 2, 3], "b": [4.0, 5.0, 6.0]}, name="t_exp")
assert df.to_pylist() == [
    {"a": 1, "b": 4.0},
    {"a": 2, "b": 5.0},
    {"a": 3, "b": 6.0},
]
assert list(df.to_pydict().keys()) == ["a", "b"]
assert len(df.to_pandas()) == 3
assert df.to_arrow_table().num_rows == 3
roundtrip = ctx.from_arrow(df.to_arrow_table())
assert roundtrip.count() == 3

# -- query-pyarrow-data.py --------------------------------------------------
batch = pa.RecordBatch.from_arrays(
    [pa.array([1, 2, 3]), pa.array([10, 20, 30])], names=["x", "y"]
)
ctx.register_record_batches("pa_t", [[batch]])
assert ctx.sql("SELECT sum(y) AS s FROM pa_t").to_pylist() == [{"s": 60}]

# -- array-operations.py ----------------------------------------------------
arr_df = ctx.from_pydict({"g": [1, 1, 2], "v": [3, 1, 9]})
out = arr_df.aggregate(
    [col("g")],
    [f.array_agg(col("v"), distinct=True, order_by=[col("v").sort()]).alias("vs")],
).sort(col("g").sort())
rows = out.to_pylist()
assert rows[0]["vs"] == [1, 3] and rows[1]["vs"] == [9]
made = ctx.from_pydict({"a": [1]}).select(
    f.make_array(lit(1), lit(2), lit(3)).alias("arr")
)
assert made.to_pylist()[0]["arr"] == [1, 2, 3]

# -- sql-parquet.py ---------------------------------------------------------
ctx.register_parquet("orders", f"{sf_dir}/orders.parquet")
n_orders = ctx.sql("SELECT count(*) AS n FROM orders").to_pylist()[0]["n"]
assert n_orders > 0

# -- dataframe-parquet.py ---------------------------------------------------
with tempfile.TemporaryDirectory() as tmp:
    dest = os.path.join(tmp, "out.parquet")
    ctx.read_parquet(f"{sf_dir}/orders.parquet").limit(10).write_parquet(dest)
    assert ctx.read_parquet(dest).count() == 10

# -- csv-read-options.py ----------------------------------------------------
with tempfile.TemporaryDirectory() as tmp:
    csv_path = os.path.join(tmp, "pokes.csv")
    with open(csv_path, "w") as fh:
        fh.write("id|name\n1|a\n2|b\n")
    got = ctx.read_csv(csv_path, has_header=True, delimiter="|").count()
    assert got == 2

# -- sql-to-pandas.py -------------------------------------------------------
pdf = ctx.sql(
    "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1"
).to_pandas()
assert {"o_orderpriority", "n"} <= set(pdf.columns)

# -- python-udf.py ----------------------------------------------------------
is_null = udf(
    lambda arr: arr.is_null(), [pa.int64()], pa.bool_(), "immutable", name="is_null_fn"
)
udf_df = ctx.from_pydict({"a": [1, None, 3]}).select(is_null(col("a")).alias("n"))
assert [r["n"] for r in udf_df.to_pylist()] == [False, True, False]

# -- python-udaf.py + sql-using-python-udaf.py ------------------------------
class Summer(Accumulator):
    def __init__(self):
        self._s = 0.0

    def state(self):
        return [self._s]

    def update(self, values):
        self._s += pa.compute.sum(values).as_py() or 0.0

    def merge(self, states):
        self._s += sum(s.as_py() if hasattr(s, "as_py") else s for s in states)

    def evaluate(self):
        return pa.scalar(self._s)


my_sum = udaf(Summer, ["float64"], "float64", name="my_sum_tour")
agg_df = ctx.from_pydict({"g": [1, 1, 2], "v": [1.5, 2.5, 9.0]}, name="udaf_t")
got = agg_df.aggregate([col("g")], [my_sum(col("v")).alias("s")]).sort(col("g").sort())
assert [r["s"] for r in got.to_pylist()] == [4.0, 9.0]
ctx.register_udaf(my_sum)
sql_got = ctx.sql(
    "SELECT g, my_sum_tour(v) AS s FROM udaf_t GROUP BY g ORDER BY g"
).to_pylist()
assert [r["s"] for r in sql_got] == [4.0, 9.0]

# -- sql-using-python-udf.py ------------------------------------------------
ctx.register_udf(is_null)
assert "is_null_fn" in ctx.udfs()

# -- python-udwf.py ---------------------------------------------------------
from datafusion_python_spark.api.udf import WindowEvaluator, udwf


class RunningMax(WindowEvaluator):
    def evaluate_all(self, values, num_rows):
        vals = values[0].to_pylist()
        out, cur = [], None
        for v in vals:
            cur = v if cur is None or (v is not None and v > cur) else cur
            out.append(cur)
        return pa.array(out, type=pa.int64())


rmax = udwf(RunningMax, ["int64"], "int64", name="rmax")
win_in = ctx.from_pydict({"k": [1, 1, 1], "o": [1, 2, 3], "v": [5, 3, 9]})
win_out = rmax.apply(win_in, ["k"], ["o"], ["v"], "m").sort(col("o").sort())
assert [r["m"] for r in win_out.to_pylist()] == [5, 5, 9]

# -- multiprocessing_pickle_expr.py / ray_pickle_expr.py --------------------
import pickle

expr = (col("a") + lit(1)).alias("a1")
expr2 = pickle.loads(pickle.dumps(expr))
shipped = ctx.from_pydict({"a": [41]}).select(expr2)
assert shipped.to_pylist() == [{"a1": 42}]

# -- substrait.py: serialize → file → deserialize → consume → execute ------
from datafusion_python_spark.api import substrait

ctx.from_pydict({"x": [1, 2, 3]}, name="t_sub")
with tempfile.TemporaryDirectory() as d:
    plan_path = os.path.join(d, "plan.substrait")
    substrait.Serde.serialize("SELECT x FROM t_sub WHERE x > 1", ctx, plan_path)
    plan = substrait.Serde.deserialize(plan_path)
    logical = substrait.Consumer.from_substrait_plan(ctx, plan)
    result = ctx.create_dataframe_from_logical_plan(logical)
    assert sorted(r["x"] for r in result.to_pylist()) == [2, 3]

# -- unparser: DataFrame plan → SQL → re-execute ---------------------------
from datafusion_python_spark.api.substrait import Dialect, Unparser

tour_df = ctx.table("t_sub").filter(col("x") > lit(1))
sql_text = Unparser(Dialect.default()).plan_to_sql(tour_df.logical_plan())
assert sorted(r["x"] for r in ctx.sql(sql_text).to_pylist()) == [2, 3]

# -- sql-parquet-s3.py: object-store config shim ---------------------------
from datafusion_python_spark.sources.object_store import AmazonS3

ctx.register_object_store(
    "s3://tour-bucket/", AmazonS3("tour-bucket", region="us-east-1")
)

print("reference example tour: all sections passed")
