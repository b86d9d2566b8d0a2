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
