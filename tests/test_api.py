"""API façade tests, modeled on the reference's python/tests style
(conftest 3-column fixture + operator matrices)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from datafusion_python_spark.api import (
    SessionContext,
    SQLOptions,
    col,
    functions as f,
    lit,
    udf,
)
from datafusion_python_spark.api.expr import Window, WindowFrame


@pytest.fixture(scope="module")
def ctx():
    return SessionContext()


@pytest.fixture(scope="module")
def df(ctx):
    # the reference's workhorse fixture (conftest.py:40)
    return ctx.from_pydict(
        {"a": [1, 2, 3], "b": [4.0, 5.0, 6.0], "c": ["x", "x", "y"]}, name="t_abc"
    )


def test_select_filter(df):
    out = df.filter(col("a") > 1).select(col("a"), (col("b") * 2).alias("b2"))
    d = out.to_pydict()
    assert d == {"a": [2, 3], "b2": [10.0, 12.0]}


def test_select_exprs_and_sql_strings(df):
    out = df.select_exprs("a + 1 AS a1").to_pydict()
    assert out == {"a1": [2, 3, 4]}
    out2 = df.filter("a >= 2").count()
    assert out2 == 2


def test_aggregate_and_builder(df):
    out = df.aggregate([col("c")], [f.sum(col("a")).alias("s")]).sort("c").to_pydict()
    assert out == {"c": ["x", "y"], "s": [3, 3]}
    # global agg + filter modifier
    out2 = df.aggregate([], [f.sum(col("a"), filter=col("c") == "x").alias("s")]).to_pydict()
    assert out2 == {"s": [3]}
    # distinct
    out3 = df.aggregate([], [f.count(col("c"), distinct=True).alias("n")]).to_pydict()
    assert out3 == {"n": [2]}


def test_case_when(df):
    e = f.case(col("c")).when("x", lit(1)).otherwise(lit(0)).alias("is_x")
    assert df.select(e).to_pydict() == {"is_x": [1, 1, 0]}
    e2 = f.when(col("a") > 2, lit("big")).otherwise(lit("small")).alias("sz")
    assert df.select(e2).to_pydict() == {"sz": ["small", "small", "big"]}


def test_sort_null_handling(ctx):
    d = ctx.from_pydict({"x": [3, None, 1]})
    asc = d.sort(col("x").sort(ascending=True, nulls_first=True)).to_pydict()["x"]
    assert asc == [None, 1, 3]
    desc = d.sort(col("x").sort(ascending=False, nulls_first=False)).to_pydict()["x"]
    assert desc == [3, 1, None]


def test_joins(ctx):
    left = ctx.from_pydict({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    right = ctx.from_pydict({"k": [2, 3, 4], "w": [20, 30, 40]})
    inner = left.join(right, on="k").sort("k").to_pydict()
    assert inner["k"] == [2, 3] and inner["w"] == [20, 30]
    semi = left.join(right, on="k", how="semi").sort("k").to_pydict()
    assert semi["v"] == ["b", "c"]
    anti = left.join(right, on="k", how="anti").to_pydict()
    assert anti["v"] == ["a"]
    r2 = ctx.from_pydict({"k2": [2, 3, 4], "w": [20, 30, 40]})
    theta = left.join_on(r2, col("k") < col("k2"), col("w") >= 30).count()
    assert theta == 5  # (1,3),(1,4),(2,3→no w<30? w=30 yes),(2,4),(3,4)
    with pytest.raises(ValueError, match="invalid join type"):
        left.join(right, on="k", how="sideways")


def test_set_ops(ctx):
    a = ctx.from_pydict({"x": [1, 2, 2, 3]})
    b = ctx.from_pydict({"x": [2, 3, 4]})
    assert sorted(a.union(b).to_pydict()["x"]) == [1, 2, 2, 2, 3, 3, 4]
    assert sorted(a.union(b, distinct=True).to_pydict()["x"]) == [1, 2, 3, 4]
    assert sorted(a.intersect(b).to_pydict()["x"]) == [2, 3]
    assert sorted(a.except_all(b).to_pydict()["x"]) == [1, 2]


def test_distinct_on(ctx):
    d = ctx.from_pydict({"g": [1, 1, 2], "v": [10, 20, 30]})
    out = d.distinct_on([col("g")], [col("g"), col("v")], [col("v").sort(False)])
    assert sorted(map(tuple, zip(*out.to_pydict().values()))) == [(1, 20), (2, 30)]


def test_unnest(ctx):
    d = ctx.from_pydict({"id": [1, 2], "xs": [[1, 2], [3]]})
    out = d.unnest_columns("xs").sort("xs").to_pydict()
    assert out["xs"] == [1, 2, 3]


def test_window_over(ctx):
    d = ctx.from_pydict({"g": ["a", "a", "b"], "v": [1, 2, 5]})
    w = Window(partition_by=[col("g")], order_by=[col("v").sort()])
    out = d.select(col("g"), col("v"), f.sum(col("v")).over(w).alias("rsum")).sort(
        "g", "v"
    ).to_pydict()
    assert out["rsum"] == [1, 3, 5]
    # kwarg form like the reference's window functions
    out2 = d.select(
        col("g"),
        f.row_number(partition_by=[col("g")], order_by=[col("v").sort(False)]).alias("rn"),
    ).sort("g", "rn").to_pydict()
    assert out2["rn"] == [1, 2, 1]


def test_window_frame_groups(ctx):
    """GROUPS frames emulate exactly via dense_rank + RANGE (SURVEY §2.5).

    Peer groups on v: [1,1] then [2,2] then [5]. GROUPS BETWEEN 1
    PRECEDING AND CURRENT ROW sums the current and previous peer group —
    distinct from both ROWS (would cut mid-group) and RANGE (value
    distance, not group distance).
    """
    d = ctx.from_pydict({"g": ["a"] * 5, "v": [1, 1, 2, 2, 5]})
    w = Window(
        partition_by=[col("g")],
        order_by=[col("v").sort()],
        window_frame=WindowFrame("groups", 1, 0),
    )
    out = d.select(
        col("v"), f.sum(col("v")).over(w).alias("gsum")
    ).sort("v").to_pydict()
    assert out["gsum"] == [2, 2, 6, 6, 9]

    # groups frames require explicit bounds, matching the reference
    # (ref expr.py:1605-1608, tests/test_dataframe.py
    # test_invalid_window_frame[groups-None-0])
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="(?i)groups"):
        WindowFrame("groups", None, 0)

    # wide explicit bound == running count over whole peer groups
    w2 = Window(
        partition_by=[col("g")],
        order_by=[col("v").sort()],
        window_frame=WindowFrame("groups", 10, 0),
    )
    out2 = d.select(
        col("v"), f.count(col("v")).over(w2).alias("gcnt")
    ).sort("v").to_pydict()
    assert out2["gcnt"] == [2, 2, 4, 4, 5]


def test_limit_offset_head_tail(ctx):
    d = ctx.from_pydict({"x": list(range(10))}).sort("x")
    assert d.limit(3).to_pydict()["x"] == [0, 1, 2]
    assert d.limit(3, offset=4).to_pydict()["x"] == [4, 5, 6]
    assert d.head(2).to_pydict()["x"] == [0, 1]
    assert d.tail(2).to_pydict()["x"] == [8, 9]


def test_scalar_function_matrix(ctx):
    d = ctx.from_pydict({"s": ["Hello World", "abc", ""], "n": [2.25, -1.5, 0.0]})
    out = d.select(
        f.upper(col("s")).alias("u"),
        f.length(col("s")).alias("ln"),
        f.substr(col("s"), 1, 5).alias("sub"),
        f.abs(col("n")).alias("ab"),
        f.round(col("n"), 1).alias("rd"),
        f.md5(col("s")).alias("h"),
        f.regexp_replace(col("s"), "[aeiou]", "_").alias("rr"),
    ).to_pydict()
    assert out["u"][0] == "HELLO WORLD"
    assert out["ln"] == [11, 3, 0]
    assert out["sub"][0] == "Hello"
    assert out["ab"] == [2.25, 1.5, 0.0]
    assert out["rr"][1] == "_bc"


def test_gcd_lcm(ctx):
    d = ctx.from_pydict({"a": [12, 7, 0], "b": [18, 13, 5]})
    out = d.select(f.gcd(col("a"), col("b")).alias("g"), f.lcm(col("a"), col("b")).alias("l")).to_pydict()
    assert out["g"] == [6, 1, 5]
    assert out["l"] == [36, 91, 0]


def test_array_functions(ctx):
    d = ctx.from_pydict({"xs": [[3, 1, 2], [5], []]})
    out = d.select(
        f.array_length(col("xs")).alias("n"),
        f.array_sort(col("xs")).alias("sorted"),
        f.array_reverse(col("xs")).alias("rev"),
        f.array_pop_back(col("xs")).alias("popb"),
        f.array_pop_front(col("xs")).alias("popf"),
        f.array_has(col("xs"), lit(2)).alias("has2"),
    ).to_pydict()
    assert out["n"] == [3, 1, 0]
    assert out["sorted"][0] == [1, 2, 3]
    assert out["popb"][0] == [3, 1]
    assert out["popf"][0] == [1, 2]
    assert out["has2"] == [True, False, False]


def test_higher_order_lambdas(ctx):
    d = ctx.from_pydict({"xs": [[1, 2, 3], [4, 5, 6]]})
    out = d.select(
        f.array_transform(col("xs"), lambda x: x * 2).alias("dbl"),
        f.array_filter(col("xs"), lambda x: x > 2).alias("big"),
        f.array_any_match(col("xs"), lambda x: x > 5).alias("any6"),
    ).to_pydict()
    assert out["dbl"][0] == [2, 4, 6]
    assert out["big"][0] == [3]
    assert out["any6"] == [False, True]


def test_struct_map(ctx):
    d = ctx.from_pydict({"a": [1], "b": ["x"]})
    out = d.select(f.named_struct("ia", col("a"), "sb", col("b")).alias("s")).to_pydict()
    assert out["s"][0] == {"ia": 1, "sb": "x"}


def test_ordered_aggs(ctx):
    d = ctx.from_pydict({"g": [1, 1, 1, 2], "v": [3, 1, 2, 9], "o": [1, 2, 3, 1]})
    out = d.aggregate(
        [col("g")],
        [
            f.array_agg(col("v"), order_by=[col("o")]).alias("vs"),
            f.string_agg(col("v").cast("string"), "-", order_by=[col("o")]).alias("sv"),
            f.first_value(col("v"), order_by=[col("o")]).alias("fv"),
            f.last_value(col("v"), order_by=[col("o")]).alias("lv"),
        ],
    ).sort("g").to_pydict()
    assert out["vs"][0] == [3, 1, 2]
    assert out["sv"][0] == "3-1-2"
    assert out["fv"] == [3, 9]
    assert out["lv"] == [2, 9]


def test_sql_entry_and_options(ctx, df):
    out = ctx.sql("SELECT c, count(*) AS n FROM t_abc GROUP BY c ORDER BY c").to_pydict()
    assert out == {"c": ["x", "y"], "n": [2, 1]}
    opts = SQLOptions().with_allow_ddl(False)
    with pytest.raises(ValueError):
        ctx.sql("CREATE TABLE tnew AS SELECT 1", options=opts)


def test_sql_named_params(ctx, df):
    out = ctx.sql("SELECT sum(a) AS s FROM t_abc WHERE a >= :lo", lo=2).to_pydict()
    assert out == {"s": [5]}


def test_register_and_table(ctx, df, tmp_path):
    p = str(tmp_path / "t.parquet")
    df.write_parquet(p)
    ctx.register_parquet("t_pq", p)
    assert ctx.table_exist("t_pq")
    assert ctx.table("t_pq").count() == 3
    ctx.deregister_table("t_pq")
    assert not ctx.table_exist("t_pq")


def test_csv_json_roundtrip(ctx, df, tmp_path):
    pcsv = str(tmp_path / "t_csv")
    pjson = str(tmp_path / "t_json")
    df.write_csv(pcsv, with_header=True)
    df.write_json(pjson)
    assert ctx.read_csv(pcsv).count() == 3
    assert ctx.read_json(pjson).count() == 3


def test_collect_returns_arrow(df):
    batches = df.collect()
    assert all(isinstance(b, pa.RecordBatch) for b in batches)
    assert sum(b.num_rows for b in batches) == 3
    assert isinstance(df.to_arrow_table(), pa.Table)


def test_cast_try_cast(ctx):
    d = ctx.from_pydict({"s": ["1", "x"]})
    out = d.select(col("s").try_cast("int64").alias("i")).to_pydict()
    assert out["i"] == [1, None]


def test_fill_null(ctx):
    d = ctx.from_pydict({"x": [1, None, 3]})
    assert d.select(col("x").fill_null(0).alias("x")).to_pydict()["x"] == [1, 0, 3]
    assert d.fill_null(9).to_pydict()["x"] == [1, 9, 3]


def test_scalar_udf(ctx):
    d = ctx.from_pydict({"x": [1, 2, 3]})

    @udf(["int64"], "int64")
    def add_one(arr):
        import pyarrow.compute as pc

        return pc.add(arr, 1)

    out = d.select(add_one(col("x")).alias("y")).to_pydict()
    assert out["y"] == [2, 3, 4]


def test_udaf_grouped(ctx):
    from datafusion_python_spark.api.udf import Accumulator, udaf

    class GeoMeanish(Accumulator):
        def __init__(self):
            self.s = 0.0
            self.n = 0

        def state(self):
            return [self.s, self.n]

        def update(self, values):
            self.s += sum(v.as_py() for v in values)
            self.n += len(values)

        def merge(self, states):
            pass

        def evaluate(self):
            return self.s / self.n if self.n else None

    d = ctx.from_pydict({"g": ["a", "a", "b"], "v": [1.0, 3.0, 5.0]})
    agg = udaf(GeoMeanish, ["float64"], "float64")
    out = agg.apply_grouped(d, ["g"], ["v"], "m").sort("g").to_pydict()
    assert out == {"g": ["a", "b"], "m": [2.0, 5.0]}


def test_describe_reference_shape(ctx):
    d = ctx.from_pydict({"a": [1.0, 2.0, None, 4.0], "s": ["x", "y", "z", "w"]})
    out = d.describe().to_pydict()
    stats = dict(zip(out["describe"], out["a"]))
    assert stats["count"] == 3.0
    assert stats["null_count"] == 1.0
    assert abs(stats["mean"] - 7.0 / 3) < 1e-9
    assert stats["min"] == 1.0 and stats["max"] == 4.0
    assert stats["median"] == 2.0


def test_catalog_navigation(ctx, df):
    cat = ctx.catalog()
    assert "public" in cat.names()  # DataFusion's default schema name
    sch = cat.schema("public")
    assert "t_abc" in sch.names()
    t = sch.table("t_abc")
    assert t.to_df().count() == 3
    assert [f.name for f in t.schema] == ["a", "b", "c"]


def test_explain_plans(df):
    from datafusion_python_spark.api.plan import ExecutionPlan, LogicalPlan

    # ref dataframe.py:1236-1258 — these return plan WRAPPERS, not text
    lp = df.logical_plan()
    assert isinstance(lp, LogicalPlan) and isinstance(lp.display(), str)
    opt = df.select(col("a")).optimized_logical_plan()
    assert isinstance(opt, LogicalPlan)
    assert "Project" in opt.display() or "a" in opt.display()
    ep = df.execution_plan()
    assert isinstance(ep, ExecutionPlan) and isinstance(ep.display(), str)
    assert str(lp) == lp.display()


def test_function_registry_coverage():
    from datafusion_python_spark.api.functions import function_names

    names = function_names()
    # spot-check the reference inventory's presence (SURVEY §2.8)
    for expected in [
        "abs", "acos", "array_agg", "array_sort", "cardinality", "coalesce",
        "concat_ws", "corr", "count", "date_trunc", "digest", "first_value",
        "lead", "lag", "levenshtein", "make_array", "median", "named_struct",
        "nvl2", "regexp_replace", "row_number", "split_part", "string_agg",
        "to_timestamp", "translate", "var_pop",
    ]:
        assert expected in names, expected
    # name-complete vs the reference's functions/__init__.py (324 defs,
    # round-2 sweep): every reference name resolves (some as documented
    # NotImplementedError stubs for union-type / arrow-metadata fns)
    assert len(names) >= 320
    for expected in [
        "to_local_time", "to_time", "make_time", "current_time",
        "with_metadata", "array_normalize", "array_replace_n",
        "list_distance", "list_zip", "union_extract", "union_tag",
    ]:
        assert expected in names, expected


def test_top_level_all_matches_reference():
    """Every name in the reference's datafusion.__init__.__all__ resolves
    on this package (full drop-in import surface)."""
    import ast

    import datafusion_python_spark as m

    src = open("/root/reference/python/datafusion/__init__.py").read()
    ref_all = None
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "__all__" for t in node.targets
        ):
            ref_all = ast.literal_eval(node.value)
    assert ref_all, "could not parse reference __all__"
    missing = [n for n in ref_all if not hasattr(m, n)]
    assert missing == []


def test_csv_read_options_builder_chain(tmp_path):
    from datafusion_python_spark import CsvReadOptions, SessionContext

    p = tmp_path / "t.csv"
    p.write_text("a;b\n1;x\n2;NA\n")
    opts = CsvReadOptions().with_delimiter(";").with_null_regex("NA")
    ctx = SessionContext()
    df = ctx.read_csv(str(p), options=opts)
    rows = sorted(df.to_pylist(), key=lambda r: r["a"])
    assert rows[1]["b"] is None
    import pytest as _pytest

    # real regex null markers now apply post-read (string columns)
    p2 = tmp_path / "t2.csv"
    p2.write_text("a;b\n1;x\n2;N/A\n3;NA\n")
    df2 = ctx.read_csv(str(p2), options=CsvReadOptions().with_delimiter(";").with_null_regex(r"N/?A"))
    rows2 = sorted(df2.to_pylist(), key=lambda r: r["a"])
    assert rows2[1]["b"] is None and rows2[2]["b"] is None and rows2[0]["b"] == "x"
    with _pytest.raises(ValueError):
        CsvReadOptions().with_delimiter(";;")
