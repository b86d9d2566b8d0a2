"""Lambda expressions + higher-order array functions.

Mirrors the reference's tests/test_lambda.py: callable and explicit
``lambda_`` forms, parameter-name survival into the plan, pickling,
invalid-argument errors, and the SQL keyword-lambda syntax.
"""

import pickle

import pytest

from datafusion_python_spark import SessionConfig, SessionContext, col, lit
from datafusion_python_spark.api import functions as f


@pytest.fixture(scope="module")
def lam_df():
    ctx = SessionContext()
    return ctx.from_pydict({"a": [[1, 2, 3], [4, 5]]})


def _column(df, expr, name):
    return df.select(expr.alias(name)).collect_column(name).to_pylist()


@pytest.mark.parametrize(
    ("build_expr", "expected"),
    [
        pytest.param(
            lambda: f.array_transform(col("a"), lambda v: v * 2),
            [[2, 4, 6], [8, 10]],
            id="array_transform_callable",
        ),
        pytest.param(
            lambda: f.array_transform(
                col("a"), f.lambda_(["v"], f.lambda_var("v") * lit(2))
            ),
            [[2, 4, 6], [8, 10]],
            id="array_transform_explicit_lambda",
        ),
        pytest.param(
            lambda: f.array_transform(col("a"), lambda v: 0),
            [[0, 0, 0], [0, 0]],
            id="array_transform_literal_body_is_coerced",
        ),
        pytest.param(
            lambda: f.list_transform(col("a"), lambda v: v + 1),
            [[2, 3, 4], [5, 6]],
            id="list_transform_alias",
        ),
        pytest.param(
            lambda: f.array_any_match(col("a"), lambda v: v > 3),
            [False, True],
            id="array_any_match_callable",
        ),
        pytest.param(
            lambda: f.array_any_match(
                col("a"), f.lambda_(["v"], f.lambda_var("v") > lit(2))
            ),
            [True, True],
            id="array_any_match_explicit_lambda",
        ),
        pytest.param(
            lambda: f.any_match(col("a"), lambda v: v > 4),
            [False, True],
            id="any_match_alias",
        ),
        pytest.param(
            lambda: f.list_any_match(col("a"), lambda v: v > 4),
            [False, True],
            id="list_any_match_alias",
        ),
        pytest.param(
            lambda: f.array_filter(col("a"), lambda v: v > 2),
            [[3], [4, 5]],
            id="array_filter_callable",
        ),
        pytest.param(
            lambda: f.array_filter(
                col("a"), f.lambda_(["v"], f.lambda_var("v") > lit(2))
            ),
            [[3], [4, 5]],
            id="array_filter_explicit_lambda",
        ),
        pytest.param(
            lambda: f.list_filter(col("a"), lambda v: v > 2),
            [[3], [4, 5]],
            id="list_filter_alias",
        ),
        pytest.param(
            lambda: f.array_all_match(col("a"), lambda v: v > 0),
            [True, True],
            id="array_all_match_callable",
        ),
    ],
)
def test_higher_order_function_results(lam_df, build_expr, expected):
    assert _column(lam_df, build_expr(), "r") == expected


def test_lambda_param_name_appears_in_plan(lam_df):
    expr = f.array_transform(col("a"), lambda value: value * 2)
    assert "value" in expr.canonical_name()


@pytest.mark.parametrize(
    ("arg", "exc_type", "match"),
    [
        pytest.param(42, TypeError, "expected an Expr or callable", id="non_callable"),
        pytest.param(
            lambda: lit(1),
            ValueError,
            "at least one parameter",
            id="zero_arg_callable",
        ),
    ],
)
def test_to_lambda_rejects_invalid_arg(arg, exc_type, match):
    with pytest.raises(exc_type, match=match):
        f.array_transform(col("a"), arg)


@pytest.mark.parametrize("dialect", ["DuckDB", "ClickHouse", "Snowflake", "Databricks"])
def test_sql_lambda_keyword_syntax(dialect):
    ctx = SessionContext(SessionConfig().set("datafusion.sql_parser.dialect", dialect))
    result = ctx.sql(
        "select array_transform([1, 2, 3], lambda x: x * 2) as d"
    ).collect_column("d")
    assert result.to_pylist() == [[2, 4, 6]]


def test_sql_bracket_literals_and_subscript():
    ctx = SessionContext()
    assert ctx.sql("select array(10,20,30)[1] as v").collect_column("v").to_pylist() == [20]
    assert ctx.sql("select [[1,2],[3]] as n").collect_column("n").to_pylist() == [
        [[1, 2], [3]]
    ]
    assert ctx.sql("select 'lambda [x: y]' as s").collect_column("s").to_pylist() == [
        "lambda [x: y]"
    ]
    assert ctx.sql(
        "select array_filter([1,2,3,4], lambda v: v % 2 = 0) as e"
    ).collect_column("e").to_pylist() == [[2, 4]]


def test_pickle_lambda_expr_round_trip(lam_df):
    expr = f.array_transform(col("a"), lambda v: v * 2)
    decoded = pickle.loads(pickle.dumps(expr))  # noqa: S301

    assert decoded.canonical_name() == expr.canonical_name()
    assert _column(lam_df, decoded, "r") == [[2, 4, 6], [8, 10]]
