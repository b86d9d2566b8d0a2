"""Property-based tests (hypothesis): engine results vs Python ground
truth on randomized inputs — the fuzz layer the reference lacks
(SURVEY §5 notes no property testing upstream)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from datafusion_python_spark.api import SessionContext, col, functions as f

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def ctx():
    return SessionContext()


@given(xs=st.lists(st.integers(min_value=-(2**31), max_value=2**31), min_size=1, max_size=50))
@settings(**_SETTINGS)
def test_agg_matches_python(ctx, xs):
    d = ctx.from_pydict({"x": xs})
    out = d.aggregate(
        [],
        [
            f.sum(col("x")).alias("s"),
            f.min(col("x")).alias("mn"),
            f.max(col("x")).alias("mx"),
            f.count(col("x")).alias("n"),
        ],
    ).to_pylist()[0]
    assert out["s"] == sum(xs)
    assert out["mn"] == min(xs)
    assert out["mx"] == max(xs)
    assert out["n"] == len(xs)


@given(
    xs=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=30),
    nulls_first=st.booleans(),
    ascending=st.booleans(),
)
@settings(**_SETTINGS)
def test_sort_total_order(ctx, xs, nulls_first, ascending):
    vals = xs + [None]
    d = ctx.from_pydict({"x": vals})
    got = d.sort(col("x").sort(ascending=ascending, nulls_first=nulls_first)).to_pydict()["x"]
    expected = sorted(xs, reverse=not ascending)
    expected = ([None] + expected) if nulls_first else (expected + [None])
    assert got == expected


@given(
    a=st.sets(st.sampled_from([f"w{i}" for i in range(30)]), min_size=1, max_size=20),
    b=st.sets(st.sampled_from([f"w{i}" for i in range(30)]), min_size=1, max_size=20),
)
@settings(**_SETTINGS)
def test_minhash_estimates_jaccard(ctx, a, b):
    """128-hash MinHash estimate within 0.3 of true Jaccard (Chernoff
    bound at n=128 makes larger deviation vanishingly unlikely)."""
    from datafusion_python_spark.operators.dedup import minhash_signature

    true_j = len(a & b) / len(a | b)
    d = ctx.from_pydict({"doc_id": [1, 2], "text": [" ".join(sorted(a)), " ".join(sorted(b))]})
    sig = minhash_signature(d.df, "text", num_hashes=128, shingle_k=1)
    rows = {r.doc_id: r.minhash for r in sig.select("doc_id", "minhash").collect()}
    est = sum(1 for x, y in zip(rows[1], rows[2]) if x == y) / 128
    assert abs(est - true_j) <= 0.3, (true_j, est)


@given(s=st.text(alphabet=st.characters(codec="ascii"), max_size=40))
@settings(**_SETTINGS)
def test_string_roundtrip(ctx, s):
    d = ctx.from_pydict({"s": [s, s]})
    out = d.select(
        f.reverse(f.reverse(col("s"))).alias("rr"),
        f.length(col("s")).alias("n"),
        f.upper(f.lower(col("s"))).alias("ul"),
    ).to_pylist()[0]
    assert out["rr"] == s
    assert out["n"] == len(s)
    assert out["ul"] == s.lower().upper()


@given(
    n_words=st.integers(min_value=0, max_value=60),
    chunk=st.integers(min_value=1, max_value=12),
    overlap=st.integers(min_value=0, max_value=11),
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunking_invariants(ctx, n_words, chunk, overlap):
    """Every token is covered, chunk count matches the stride formula, and
    consecutive chunks overlap by exactly `overlap` tokens."""
    from datafusion_python_spark.operators.chunking import chunk_documents

    if overlap >= chunk:
        return  # invalid combination is tested separately (raises)
    words = [f"t{i}" for i in range(n_words)]
    df = ctx.spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk, overlap).collect(),
        key=lambda r: r["chunk_id"],
    )
    stride = chunk - overlap
    expected_chunks = 0 if n_words == 0 else (n_words + stride - 1) // stride
    assert len(rows) == expected_chunks
    seen = set()
    for i, r in enumerate(rows):
        toks = r["chunk_text"].split(" ")
        assert toks == words[i * stride : i * stride + chunk]
        seen.update(toks)
    assert seen == set(words)
