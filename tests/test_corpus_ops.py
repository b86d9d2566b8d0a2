"""Tests for the corpus-scale operators added in round 2: HLL sketch
rollups, TF-IDF/BM25 ranking, chunking, deterministic shuffle, random
projection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datafusion_python_spark.operators.chunking import chunk_documents
from datafusion_python_spark.operators.projection import (
    projection_signs,
    random_projection,
)
from datafusion_python_spark.operators.ranking import bm25, doc_terms, tf_idf
from datafusion_python_spark.operators.sampling import deterministic_shuffle
from datafusion_python_spark.operators.sketches import (
    distinct_rollup,
    hll_estimate,
    hll_merge,
    hll_partial,
)


# ---------------------------------------------------------------- sketches
def test_hll_rollup_matches_exact_within_tolerance(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") % 1200).alias("v")
    )
    roll = distinct_rollup(df, ["g"], [], "v").collect()
    assert len(roll) == 1
    exact = df.select("v").distinct().count()
    assert abs(roll[0]["approx_distinct"] - exact) <= 0.05 * exact


def test_hll_merge_tracks_direct_sketch(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") % 5).alias("g"), (F.col("id") % 800).alias("v")
    )
    merged = hll_merge(hll_partial(df, ["g"], "v"), []).select(
        hll_estimate("hll_sketch").alias("e")
    )
    direct = df.groupBy().agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(12))).alias("e")
    )
    # union may promote sparse registers to dense, so estimates are close
    # but not bit-identical; both must sit within sketch tolerance of truth
    m, d = merged.first()["e"], direct.first()["e"]
    assert abs(m - d) <= 0.02 * 800
    assert abs(m - 800) <= 0.05 * 800 and abs(d - 800) <= 0.05 * 800


def test_distinct_rollup_requires_subset(spark):
    df = spark.range(3).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError):
        distinct_rollup(df, ["a"], ["b"], "a")


# ----------------------------------------------------------------- ranking
def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark query engine spark spark"),
            (2, "vector search and vector math"),
            (3, "query planner for the query engine"),
            (4, "unrelated words entirely here"),
        ],
        "doc_id int, text string",
    )


def test_doc_terms_counts(spark):
    t = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in doc_terms(_docs(spark), "doc_id", "text").collect()
    }
    assert t[(1, "spark")] == (3, 5)
    assert t[(3, "query")] == (2, 6)


def test_tf_idf_top_terms_and_ordering(spark):
    out = tf_idf(_docs(spark), "doc_id", "text", top_terms=1).collect()
    best = {r["doc_id"]: r["term"] for r in out}
    # the repeated, corpus-rare term wins each doc
    assert best[1] == "spark"
    assert best[2] == "vector"
    assert len(out) == 4  # exactly one term per doc


def test_bm25_ranks_heavier_tf_first(spark):
    out = bm25(_docs(spark), "doc_id", "text", ["spark", "query"]).collect()
    ids = [r["doc_id"] for r in out]
    assert set(ids) == {1, 3}
    # doc 1 has tf(spark)=3 vs doc 3 tf(query)=2 with same df pattern
    assert ids[0] == 1
    assert all(r["bm25"] > 0 for r in out)


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25(_docs(spark), "doc_id", "text", [])


# ---------------------------------------------------------------- chunking
def test_chunking_covers_all_tokens_no_overlap(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))], "doc_id int, text string"
    )
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=0).collect()
    texts = [r["chunk_text"] for r in sorted(out, key=lambda r: r["chunk_id"])]
    assert " ".join(texts).split(" ") == [f"w{i}" for i in range(10)]
    assert [r["chunk_tokens"] for r in sorted(out, key=lambda r: r["chunk_id"])] == [
        4,
        4,
        2,
    ]


def test_chunking_overlap_stride(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(8)))], "doc_id int, text string"
    )
    out = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    # stride 2: starts at tokens 0,2,4,6
    assert [r["chunk_text"].split(" ")[0] for r in out] == ["w0", "w2", "w4", "w6"]
    # consecutive chunks share `overlap` tokens
    assert out[0]["chunk_text"].split(" ")[2:] == out[1]["chunk_text"].split(" ")[:2]


def test_chunking_empty_doc_and_validation(spark):
    df = spark.createDataFrame([(1, ""), (2, "one two")], "doc_id int, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=5).collect()
    assert {r["doc_id"] for r in out} == {2}
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


# ---------------------------------------------------- deterministic shuffle
def test_deterministic_shuffle_stable_and_salt_sensitive(spark):
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    a = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", "s1").collect()]
    b = [
        r["doc_id"]
        for r in deterministic_shuffle(df.repartition(7), "doc_id", "s1").collect()
    ]
    c = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", "s2").collect()]
    assert a == b  # partition-layout invariant
    assert a != c  # epochs differ
    assert sorted(a) == list(range(500))  # a permutation


# --------------------------------------------------------------- projection
def test_projection_signs_deterministic(spark):
    assert projection_signs(8, 4, seed=1) == projection_signs(8, 4, seed=1)
    assert projection_signs(8, 4, seed=1) != projection_signs(8, 4, seed=2)
    assert all(v in (1.0, -1.0) for row in projection_signs(8, 4) for v in row)


def test_random_projection_preserves_cosine_roughly(spark, sf_dir):
    from datafusion_python_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(40)
    proj = random_projection(emb, "embedding", out_dim=32, seed=7)
    rows = proj.select("vec_id", "embedding", "proj").collect()

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))

    # JL: random-projected cosines track originals; 64→32 dims keeps the
    # error modest — check mean absolute deviation over pairs, not worst-case
    devs = []
    for i in range(0, 10):
        a, b = rows[i], rows[i + 10]
        devs.append(
            abs(
                cos([float(x) for x in a["embedding"]], [float(x) for x in b["embedding"]])
                - cos(a["proj"], b["proj"])
            )
        )
    assert sum(devs) / len(devs) < 0.2


def test_random_projection_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id int, embedding array<float>")
    with pytest.raises(ValueError):
        random_projection(df, "embedding", out_dim=4)


# ------------------------------------------------------------------ layout
def test_zvalue_matches_reference_interleave(spark):
    from datafusion_python_spark.operators.layout import zvalue

    def ref_z(vals, bits, n):
        out = 0
        for i, v in enumerate(vals):
            v &= (1 << bits) - 1
            for b in range(bits):
                out |= ((v >> b) & 1) << (b * n + i)
        return out

    df = spark.createDataFrame(
        [(a, b) for a in range(8) for b in range(8)], "a int, b int"
    )
    rows = df.select(
        "a", "b", zvalue(["a", "b"], bits=3).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == ref_z([r["a"], r["b"]], 3, 2), (r["a"], r["b"])


def test_bucketize_clamps_and_scales(spark):
    from datafusion_python_spark.operators.layout import bucketize

    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (99.9,), (150.0,)], "x double")
    out = [r["b"] for r in df.select(bucketize("x", 0.0, 100.0, bits=2).alias("b")).collect()]
    assert out == [0, 0, 2, 3, 3]  # clamped below/above, linear inside


def test_zorder_layout_partitions_are_z_ranges(spark):
    from datafusion_python_spark.operators.layout import zorder_layout

    df = spark.range(0, 4096).select(
        (F.col("id") % 61).alias("x"), ((F.col("id") * 7) % 53).alias("y")
    )
    out = zorder_layout(df, ["x", "y"], bits=6, num_partitions=8, z_col="z")
    ranges = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .orderBy("pid")
        .collect()
    )
    assert len(ranges) > 1
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev["hi"] <= cur["lo"]  # range partitioning: disjoint z spans


# -------------------------------------------------------- incremental dedup
def test_incremental_dedup_drops_seen_content(spark):
    from datafusion_python_spark.operators.dedup import incremental_dedup

    history = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "hello world")], "doc_id int, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "THE QUICK  BROWN FOX"),  # dup of history 1 after normalization
            (11, "hello world"),  # exact dup of history 2
            (12, "something new"),
            (13, "Something   NEW"),  # in-batch dup of 12
        ],
        "doc_id int, text string",
    )
    out = incremental_dedup(new, history, "text", "doc_id").collect()
    assert len(out) == 1
    assert out[0]["keep_id"] == 12 and out[0]["n_dups"] == 2


def test_incremental_dedup_broadcasts_history(spark):
    from datafusion_python_spark.operators.dedup import incremental_dedup
    from datafusion_python_spark.plans import explain_str

    h = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    n = spark.createDataFrame([(2, "x y z")], "doc_id int, text string")
    plan = explain_str(incremental_dedup(n, h, "text", "doc_id", broadcast_history=True))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# ------------------------------------------------------------- lm perplexity
def test_perplexity_known_values(spark):
    from datafusion_python_spark.operators.lm import perplexity, train_bigram_counts

    train = spark.createDataFrame([(0, "a b a b a c")], "doc_id int, text string")
    model = train_bigram_counts(train, "doc_id", "text")
    # model: c2(a,b)=2 c2(b,a)=2 c2(a,c)=1; c1(a)=3 c1(b)=2; V=3
    rows = {
        r["prev"] + ">" + r["word"]: (r["c2"], r["c1"], r["v"])
        for r in model.collect()
    }
    assert rows["a>b"] == (2, 3, 3) and rows["b>a"] == (2, 2, 3)
    score = spark.createDataFrame(
        [(1, "a b"), (2, "z z"), (3, "x")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r["ppl"] for r in perplexity(score, model, "doc_id", "text").collect()}
    # seen bigram: P = (2+0.5)/(3+1.5) -> ppl = 4.5/2.5 = 1.8
    assert abs(out[1] - 1.8) < 1e-9
    # fully unseen: P = 0.5/1.5 -> ppl = 3
    assert abs(out[2] - 3.0) < 1e-9
    assert 3 not in out  # single-token doc has no bigrams


def test_perplexity_model_side_broadcasts(spark):
    from datafusion_python_spark.operators.lm import perplexity, train_bigram_counts
    from datafusion_python_spark.plans import explain_str

    df = spark.createDataFrame([(0, "a b c a b")], "doc_id int, text string")
    plan = explain_str(perplexity(df, train_bigram_counts(df, "doc_id", "text"), "doc_id", "text"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------ funnel/cohort
def test_funnel_strict_ordering(spark):
    from datafusion_python_spark.operators.funnel import funnel

    rows = [
        # u1 completes in order
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:10:00", "purchase"),
        # u2: purchase BEFORE click -> only 2 steps count
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 09:00:00", "purchase"),
        (2, "2024-01-01 10:05:00", "click"),
        # u3: never viewed -> excluded entirely
        (3, "2024-01-01 10:00:00", "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts_s string, event_type string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "event_type"
    )
    out = {r["user_id"]: r["steps_completed"] for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert out == {1: 3, 2: 2}


def test_funnel_within_bound(spark):
    from datafusion_python_spark.operators.funnel import funnel

    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-03 10:00:00", "click"),  # 2 days later: outside 1 day
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts_s string, event_type string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "event_type"
    )
    out = funnel(ev, ["view", "click"], within=F.expr("INTERVAL 1 DAY")).collect()
    assert out[0]["steps_completed"] == 1
    out2 = funnel(ev, ["view", "click"], within=F.expr("INTERVAL 3 DAYS")).collect()
    assert out2[0]["steps_completed"] == 2


def test_retention_cohorts_triangle(spark):
    from datafusion_python_spark.operators.funnel import retention_cohorts

    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-02 10:00:00"),
        (2, "2024-01-01 23:00:00"),
        (2, "2024-01-03 01:00:00"),
        (3, "2024-01-02 05:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts")
    )
    out = {
        (r["cohort"], r["day_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


# -------------------------------------------------------------------- skew
def test_salted_agg_matches_plain(spark):
    from datafusion_python_spark.operators.skew import salted_agg

    # 90% of rows share one hot key
    df = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        (F.col("id") % 100).alias("v"),
    )
    got = {
        r["k"]: (r["s"], r["n"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {"s": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")},
            salt_buckets=8,
            salt_on=["k", "v"],
        ).collect()
    }
    exact = {
        r["k"]: (r["s"], r["n"], r["mx"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx")).collect()
    }
    assert got == exact


def test_salted_join_matches_plain(spark):
    from datafusion_python_spark.operators.skew import salted_join

    fact = spark.range(0, 1000).select(
        F.when(F.col("id") % 5 < 4, 1).otherwise((F.col("id") % 7) + 2).alias("k"),
        F.col("id").alias("fid"),
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(1, 10)], "k long, payload string")
    plain = {(r["fid"], r["payload"]) for r in fact.join(dim, "k").collect()}
    salted = {(r["fid"], r["payload"]) for r in salted_join(fact, dim, ["k"], salt_buckets=4).collect()}
    assert salted == plain
    # hybrid: salt only the hot key
    hot = spark.createDataFrame([(1,)], "k long")
    hybrid = {
        (r["fid"], r["payload"])
        for r in salted_join(fact, dim, ["k"], salt_buckets=4, only_keys=hot).collect()
    }
    assert hybrid == plain


def test_salted_join_left_keeps_unmatched(spark):
    from datafusion_python_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, 10), (99, 11)], "k long, fid long")
    dim = spark.createDataFrame([(1, "d1")], "k long, payload string")
    out = {(r["fid"], r["payload"]) for r in salted_join(fact, dim, ["k"], how="left").collect()}
    assert out == {(10, "d1"), (11, None)}


# -------------------------------------------------------------------- fuzzy
def test_fuzzy_self_pairs_finds_typos(spark):
    from datafusion_python_spark.operators.fuzzy import fuzzy_self_pairs

    df = spark.createDataFrame(
        [
            (1, "spark engine"),
            (2, "spork engine"),   # 1 edit from 1
            (3, "spark enginee"),  # 1 edit from 1, 2 from 2
            (4, "completely different"),
        ],
        "id int, s string",
    )
    out = {(r["id_a"], r["id_b"]): r["dist"] for r in fuzzy_self_pairs(df, "id", "s", 2).collect()}
    assert out == {(1, 2): 1, (1, 3): 1, (2, 3): 2}


def test_fuzzy_join_two_tables(spark):
    from datafusion_python_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame([(1, "acme corp")], "lid int, lname string")
    right = spark.createDataFrame(
        [(10, "acme corp."), (11, "bizarro inc")], "rid int, rname string"
    )
    out = fuzzy_join(left, right, "lname", "rname", max_distance=1).collect()
    assert len(out) == 1 and out[0]["rid"] == 10 and out[0]["dist"] == 1
