"""Tests for the corpus-shaping operators added late in round 2:
connected-components dedup clustering, deterministic hash sampling,
per-domain caps, token-budget packing, repetition signals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_python_spark.operators.cluster import (
    canonical_docs,
    connected_components,
    dedup_clusters,
)
from datafusion_python_spark.operators.sampling import (
    domain_cap,
    hash_sample,
    mixture_sample,
    token_pack,
)
from datafusion_python_spark.operators.text import repetition_features


def test_connected_components_chain(spark):
    # 1-2-3-4 chain (diameter 3, needs >1 iteration) plus isolated pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_bridge_merge(spark):
    # two cliques joined by one bridge edge collapse into one component
    edges = [(1, 2), (1, 3), (2, 3), (5, 6), (5, 7), (6, 7), (3, 5)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    comps = set(
        r["component"] for r in connected_components(pairs).collect()
    )
    assert comps == {1}


def test_dedup_clusters_and_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "id_a long, id_b long")
    clustered = {
        r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, pairs).collect()
    }
    assert clustered == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 1}
    kept = sorted(r["doc_id"] for r in canonical_docs(docs, pairs).collect())
    assert kept == [0, 1, 2, 3]


def test_hash_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in hash_sample(df, "k", 0.2).collect())
    b = sorted(r["k"] for r in hash_sample(df.repartition(7), "k", 0.2).collect())
    assert a == b  # layout-independent
    assert 0.1 < len(a) / 2000 < 0.3  # ~rate
    assert hash_sample(df, "k", 0.0).count() == 0
    assert hash_sample(df, "k", 1.0).count() == 2000
    with pytest.raises(ValueError):
        hash_sample(df, "k", 1.5)


def test_mixture_sample_quotas_and_determinism(spark):
    import math

    # 3 domains with counts 900 / 90 / 10: alpha=0.5 up-weights the tail
    rows = (
        [(i, "big") for i in range(900)]
        + [(1000 + i, "mid") for i in range(90)]
        + [(2000 + i, "small") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(df, "source", "doc_id", total=100, alpha=0.5)
    kept = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    norm = math.sqrt(900) + math.sqrt(90) + math.sqrt(10)
    expect = {
        d: min(c, math.floor(100 * math.sqrt(c) / norm + 1e-6))
        for d, c in (("big", 900), ("mid", 90), ("small", 10))
    }
    assert kept == expect
    # alpha=0.5 gives the 1%-share domain ~7% of the draw (vs 1 doc at alpha=1)
    assert kept["small"] >= 5
    # deterministic across partition layouts, and nested in `total`
    ids = sorted(r["doc_id"] for r in out.collect())
    ids_repart = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df.repartition(13), "source", "doc_id", total=100, alpha=0.5
        ).collect()
    )
    assert ids == ids_repart
    ids_half = sorted(
        r["doc_id"]
        for r in mixture_sample(df, "source", "doc_id", total=50, alpha=0.5).collect()
    )
    assert set(ids_half) <= set(ids)
    with pytest.raises(ValueError):
        mixture_sample(df, "source", "doc_id", total=0)


def test_domain_cap(spark):
    rows = [(d, i, 100 - i) for d in ("a", "b") for i in range(10)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    out = domain_cap(df, "source", 3)
    per = out.groupBy("source").count().collect()
    assert all(r["count"] == 3 for r in per)
    # best-first: largest n_chars kept
    kept_a = sorted(
        r["doc_id"] for r in out.filter(F.col("source") == "a").collect()
    )
    assert kept_a == [0, 1, 2]


def test_token_pack_bins(spark):
    df = spark.createDataFrame(
        [(i, "s", 700) for i in range(10)], "doc_id long, source string, tokens long"
    )
    out = token_pack(df, "tokens", 2000, group_col="source").orderBy("doc_id").collect()
    bins = [r["pack_bin"] for r in out]
    # starts: 0,700,1400,2100,... -> bins 0,0,0,1,1,1,2,2,2,3
    assert bins == [0, 0, 0, 1, 1, 1, 2, 2, 2, 3]
    # bins are contiguous from 0 and non-decreasing in doc order
    assert bins[0] == 0 and all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))


from hypothesis import HealthCheck, given, settings, strategies as st


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=12,
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find(spark, edges):
    # oracle: plain union-find with min-id canonicalization
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == expected


def test_redact_pii(spark):
    from datafusion_python_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com or call +1 (555) 123-4567 now"),
            (2, "ssn 123-45-6789 from 10.0.0.1"),
            (3, "clean text no pii"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert "[EMAIL]" in out[1]["text_redacted"]
    assert "[PHONE]" in out[1]["text_redacted"]
    assert "bob@" not in out[1]["text_redacted"]
    assert "[SSN]" in out[2]["text_redacted"]
    assert "[IP]" in out[2]["text_redacted"]
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[3]["text_redacted"] == "clean text no pii"
    assert out[3]["n_email"] == out[3]["n_ssn"] == out[3]["n_ip"] == 0


def test_repetition_features(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "w x y z"), (3, "go go go stop stop go"), (4, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert out[1]["dup_word_frac"] == 0.75  # 1 distinct of 4
    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[1]["dup_2gram_frac"] == pytest.approx(2 / 3, abs=1e-4)  # a_a ×3
    assert out[3]["dup_word_frac"] == pytest.approx(1 - 2 / 6, abs=1e-4)
    assert out[4]["dup_word_frac"] == 0.0 and out[4]["dup_2gram_frac"] == 0.0


@given(
    tokens=st.lists(st.integers(1, 3000), min_size=1, max_size=40),
    budget=st.sampled_from([500, 2000, 8000]),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_token_pack_invariants(spark, tokens, budget):
    rows = [(i, "g", int(t)) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "doc_id long, source string, tokens long")
    out = token_pack(df, "tokens", budget, group_col="source").orderBy("doc_id").collect()
    bins = [r["pack_bin"] for r in out]
    # bins start at 0, are non-decreasing, and never skip more than the
    # doc's own token span allows
    assert bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))
    # each doc's bin equals floor(start_offset / budget)
    start = 0
    for r in out:
        assert r["pack_bin"] == start // budget
        start += r["tokens"]


@given(rate=st.sampled_from([0.05, 0.25, 0.5, 0.75]))
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_hash_sample_rate_accuracy(spark, rate):
    df = spark.range(0, 4000).withColumnRenamed("id", "k")
    got = hash_sample(df, "k", rate).count() / 4000
    assert abs(got - rate) < 0.05  # md5 prefix is uniform


def test_stratified_sample_nested_and_exact(spark):
    from datafusion_python_spark.operators.sampling import stratified_sample

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = stratified_sample(
        df, "source", {"a": 1.0, "b": 0.5, "c": 0.0}, "doc_id", default_rate=0.0
    )
    by_src = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src.get("a") == 1000  # rate 1.0 keeps everything
    assert "c" not in by_src  # rate 0.0 keeps nothing
    assert 400 < by_src.get("b", 0) < 600  # ~0.5
    # nesting: the 0.25 sample of b is a subset of the 0.5 sample
    b50 = {r["doc_id"] for r in stratified_sample(df, "source", {"b": 0.5}, "doc_id").collect()}
    b25 = {r["doc_id"] for r in stratified_sample(df, "source", {"b": 0.25}, "doc_id").collect()}
    assert b25 <= b50
    # per-stratum selection matches the global hash_sample at the same rate
    b_only = df.filter(F.col("source") == "b")
    assert b50 == {r["doc_id"] for r in hash_sample(b_only, "doc_id", 0.5).collect()}


def test_stratified_sample_validates_rates(spark):
    from datafusion_python_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        stratified_sample(df, "source", {"a": 1.5}, "doc_id")
    with pytest.raises(ValueError):
        stratified_sample(df, "source", {"a": 0.5}, "doc_id", default_rate=-0.1)


def test_decontaminate_flags_planted_overlap(spark):
    from datafusion_python_spark.operators.decontaminate import (
        contamination_report,
        decontaminate,
    )

    eval_df = spark.createDataFrame(
        [(1000, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains "quick brown fox jumps" → 2 shared 3-grams
            (1, "a quick brown fox jumps today"),
            # no 3-gram overlap
            (2, "completely different words entirely here now"),
            # case/whitespace-normalized match: 1 shared 3-gram
            (3, "THE   Quick   BROWN cat sat"),
            # too short for any 3-gram
            (4, "quick brown"),
        ],
        "doc_id long, text string",
    )
    rep = {r["doc_id"]: r["n_collisions"] for r in contamination_report(corpus, eval_df, n=3).collect()}
    assert rep == {1: 2, 3: 1}
    clean = decontaminate(corpus, eval_df, n=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 4]
    # min_overlap=2 spares the single-collision doc
    clean2 = decontaminate(corpus, eval_df, n=3, min_overlap=2)
    assert sorted(r["doc_id"] for r in clean2.collect()) == [2, 3, 4]


def test_decontaminate_hash_vs_string_grams_agree(spark, sf_dir):
    from datafusion_python_spark.operators.decontaminate import contamination_report
    from datafusion_python_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    hashed = contamination_report(corpus, eval_df, n=3, hash_grams=True)
    strings = contamination_report(corpus, eval_df, n=3, hash_grams=False)
    assert sorted(map(tuple, hashed.collect())) == sorted(map(tuple, strings.collect()))


def test_score_linear_matches_python_reference(spark):
    import hashlib

    from datafusion_python_spark.operators.scoring import (
        demo_weights,
        score_linear,
        sigmoid,
    )

    weights = demo_weights(16)
    texts = [
        (1, "The quick   brown fox"),
        (2, "one"),
        (3, ""),
        (4, "repeat repeat repeat"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in score_linear(df, "text", weights, bias=0.25, hasher="md5").collect()
    }

    def py_score(text):
        words = [w for w in text.lower().split() if w]
        if not words:
            return sigmoid(0.25)
        acc = sum(
            weights[int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 16]
            for w in words
        )
        return sigmoid(0.25 + acc / len(words))

    for doc_id, text in texts:
        assert got[doc_id] == pytest.approx(py_score(text), abs=1e-12)


def test_quality_filter_threshold_and_hashers(spark):
    from datafusion_python_spark.operators.scoring import (
        demo_weights,
        quality_filter,
        score_linear,
    )

    df = spark.createDataFrame(
        [(i, f"word{i} common text here") for i in range(50)], "doc_id long, text string"
    )
    weights = demo_weights(32)
    scored = score_linear(df, "text", weights)  # default xxhash64 path runs
    assert scored.filter(F.col("score").isNull()).count() == 0
    kept = quality_filter(df, "text", weights, threshold=0.5)
    manual = scored.filter(F.col("score") >= 0.5)
    assert kept.count() == manual.count()
    with pytest.raises(ValueError):
        score_linear(df, "text", [])
    with pytest.raises(ValueError):
        score_linear(df, "text", weights, hasher="crc32").collect()


def test_quantize_roundtrip_cosine_and_bounds(spark, sf_dir):
    import math

    from datafusion_python_spark.operators.quantize import (
        dequantize,
        quantize_embeddings,
    )
    from datafusion_python_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dq = dequantize(quantize_embeddings(emb))
    # codes stay in [-127, 127] and max |code| hits 127 for nonzero vectors
    stats = dq.select(
        F.array_min("q_emb").alias("lo"),
        F.array_max("q_emb").alias("hi"),
        F.array_max(F.transform("q_emb", lambda q: F.abs(q))).alias("amax"),
    ).collect()
    assert all(-127 <= r["lo"] and r["hi"] <= 127 for r in stats)
    assert all(r["amax"] == 127 for r in stats)
    # dequantized cosine vs original stays >= 0.999
    rows = dq.select("embedding", "embedding_dq").limit(50).collect()
    for r in rows:
        x, y = r["embedding"], r["embedding_dq"]
        dot = sum(a * b for a, b in zip(x, y))
        nx = math.sqrt(sum(a * a for a in x))
        ny = math.sqrt(sum(b * b for b in y))
        assert dot / (nx * ny) >= 0.999


def test_quantize_zero_vector_safe(spark):
    from datafusion_python_spark.operators.quantize import (
        quantize_embeddings,
        reconstruction_rmse,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    out = reconstruction_rmse(quantize_embeddings(df)).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert by_id[1]["q_scale"] == 0.0
    assert by_id[1]["q_emb"] == [0, 0, 0]
    assert by_id[1]["recon_rmse"] == 0.0
    assert by_id[2]["q_emb"][1] == -127  # absmax element pins the range
    assert by_id[2]["recon_rmse"] <= by_id[2]["q_scale"] / 2
