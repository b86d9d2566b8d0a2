"""Training-data-pipeline query suite: dedup, similarity search, text
analysis over the documents/embeddings tables.

Queries wrap the reusable operators in ``operators/`` — ALL
oracle-paired: gates that depend on hashing run the operators in their
engine-portable md5 mode (bit-identical in DuckDB), so even
MinHash/SimHash/LSH/IVF pipelines are value-checked end to end, not just
row-counted. Production defaults stay on xxhash64 (same shapes, faster
keys); the md5/xxhash64 modes are asserted to flag identical pairs in
tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
)
from .operators.similarity import cosine_near_dup_pairs, cosine_topk, lsh_bucket_ann
from .operators.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    language_id,
    quality_features,
    token_count,
)
from .tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _query_vec(spark, sf_dir) -> list[float]:
    """Embedding of vec_id=0 — the fixed ANN probe vector."""
    row = (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select("embedding").first()
    )
    return [float(x) for x in row[0]]


# --------------------------------------------------------------------------
# Exact dedup: hash-groupBy on normalized text (keep lowest doc_id).
def pipe_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id").orderBy("keep_id").select(
        "dup_key", "keep_id", "n_dups"
    )


PIPE_DEDUP_EXACT_SQL = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS dup_key,
       min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY 1 ORDER BY keep_id
"""


# --------------------------------------------------------------------------
# n-gram (unigram-set) Jaccard near-dup pairs ≥ 0.95 — exact inverted-index
# join, the verifier behind MinHash at scale.
def pipe_jaccard_pairs(spark, sf_dir):
    # prefix-filtered (AllPairs) variant: bit-identical pairs, ~4x the
    # throughput of the naive inverted-index join at sf0.1 (85.7 s ->
    # 20.6 s) because only prefix tokens are indexed; the oracle below
    # recomputes exact Jaccard from scratch either way, and pytest pins
    # prefix == plain across thresholds.
    from .operators.dedup import ngram_jaccard_pairs_prefix
    from .operators.sampling import hash_sample

    # Gate runs on a deterministic 50% hash-slice (the pipe_sample_hash
    # md5-prefix convention, same as pipe_minhash_lsh): pair volume —
    # the whole cost of the quadratic verify — drops ~4x, and the
    # oracle replays the identical pipeline structure on the same slice
    # (round-8 verdict #5: this gate was ~35 s of the audit run).
    docs = hash_sample(_t(spark, sf_dir, "documents"), "doc_id", 0.5)
    return ngram_jaccard_pairs_prefix(docs, "doc_id", "text", threshold=0.95).orderBy(
        "id_a", "id_b"
    )


PIPE_JACCARD_SQL = """
WITH words AS (
  SELECT doc_id, unnest(list_distinct(list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), w -> w != ''))) AS w
  FROM documents
  WHERE substr(md5(doc_id::VARCHAR), 1, 4) < '8000'
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM words GROUP BY doc_id
), ov AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM words a JOIN words b USING (w)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id_a, id_b, round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) AS jaccard
FROM ov JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.95
ORDER BY id_a, id_b
"""


# --------------------------------------------------------------------------
# MinHash + LSH candidate pairs. md5 hasher mode makes the signature
# bit-identical cross-engine, so the oracle recomputes the FULL pipeline
# (normalize → 32 family-mins → 8-band slices → bucket self-join) in
# DuckDB. Band equality is compared on the raw 4-value slice (Spark's
# band_hash is injective up to a 2^-64 xxhash collision).
def pipe_minhash_lsh(spark, sf_dir):
    # unigram shingles so the LSH estimates the same word-set Jaccard that
    # pipe_jaccard_pairs verifies exactly (8 bands × 4 rows ⇒ s-curve
    # threshold ≈ 0.59, so jaccard ≥ 0.95 pairs collide w.p. ≈ 1).
    # Gate runs on a deterministic 50% hash-slice (the pipe_sample_hash
    # md5-prefix convention): the oracle replays the identical pipeline
    # structure either way, and candidate-pair volume — the whole cost,
    # pairs ARE the working set — drops ~4× with the slice (round-7
    # verdict #6: this gate was ~50 s of the driver's correctness run).
    from .operators.sampling import hash_sample

    docs = hash_sample(_t(spark, sf_dir, "documents"), "doc_id", 0.5)
    sig = minhash_signature(docs, "text", num_hashes=32, shingle_k=1, hasher="md5")
    return lsh_candidate_pairs(sig, "doc_id", num_bands=8).orderBy("id_a", "id_b")


PIPE_MINHASH_LSH_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     x -> x != '') AS ws
  FROM documents
  WHERE substr(md5(doc_id::VARCHAR), 1, 4) < '8000'
), sig AS (
  SELECT doc_id,
         list_transform(range(0, 32), i ->
           list_min(list_transform(ws,
             s -> ('0x' || substr(md5(s || '#' || i::VARCHAR), 1, 8))::BIGINT))) AS mh
  FROM norm
), banded AS (
  SELECT doc_id, b.band,
         array_to_string(mh[b.band * 4 + 1 : b.band * 4 + 4], ',') AS key
  FROM sig, (SELECT unnest(range(0, 8)) AS band) b
)
SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
FROM banded a JOIN banded c
  ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
ORDER BY id_a, id_b
"""


# --------------------------------------------------------------------------
# Production near-dup path END TO END: MinHash-LSH candidates → exact
# Jaccard verify as ONE operator (the declared 100 TB answer for the
# regime where exact all-pairs Jaccard is quadratic). md5 hasher + fixed
# (32 hashes, 8 bands) make the candidate set deterministic, so the
# oracle replays the full composition: signature → banding → bucket
# self-join → exact word-set Jaccard over the candidates.
def pipe_neardup_lsh_verify(spark, sf_dir):
    # Same deterministic 50% hash-slice as pipe_minhash_lsh (round-7
    # verdict #6) — the oracle still replays the FULL composition
    # (signature → banding → bucket join → exact verify) over the
    # sliced corpus, so nothing about the certified logic changes.
    from .operators.dedup import near_dup_pairs_lsh
    from .operators.sampling import hash_sample

    docs = hash_sample(_t(spark, sf_dir, "documents"), "doc_id", 0.5)
    return near_dup_pairs_lsh(
        docs,
        "doc_id",
        "text",
        threshold=0.8,
        num_hashes=32,
        num_bands=8,
        shingle_k=1,
        hasher="md5",
    ).orderBy("id_a", "id_b")


PIPE_NEARDUP_LSH_VERIFY_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     x -> x != '') AS ws
  FROM documents
  WHERE substr(md5(doc_id::VARCHAR), 1, 4) < '8000'
), sig AS (
  SELECT doc_id,
         list_transform(range(0, 32), i ->
           list_min(list_transform(ws,
             s -> ('0x' || substr(md5(s || '#' || i::VARCHAR), 1, 8))::BIGINT))) AS mh
  FROM norm
), banded AS (
  SELECT doc_id, b.band,
         array_to_string(mh[b.band * 4 + 1 : b.band * 4 + 4], ',') AS key
  FROM sig, (SELECT unnest(range(0, 8)) AS band) b
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM banded a JOIN banded c
    ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
), sets AS (
  SELECT doc_id, list_distinct(ws) AS s FROM norm
)
SELECT id_a, id_b,
       round(len(list_intersect(sa.s, sb.s)) * 1.0
             / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 4) AS jaccard
FROM cand JOIN sets sa ON sa.doc_id = id_a JOIN sets sb ON sb.doc_id = id_b
WHERE round(len(list_intersect(sa.s, sb.s)) * 1.0
      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 4) >= 0.8
ORDER BY id_a, id_b
"""


# --------------------------------------------------------------------------
# SimHash near-dup pairs. md5 hasher mode → 60-bit signature that fits a
# signed BIGINT in both engines; the oracle recomputes word hashes, bit
# votes, 15-bit block candidates, and exact Hamming verify in DuckDB.
def pipe_simhash(spark, sf_dir):
    from .operators.sampling import hash_sample

    # 50% deterministic hash-slice (same convention as pipe_jaccard_pairs
    # / pipe_minhash_lsh): this is the interpreted-JVM parity twin of
    # pipe_simhash_arrow — the slice halves the per-word bit-vote cost
    # and quarters the pair join while the oracle replays the identical
    # structure (round-8 verdict #5: this gate was ~38 s of the audit).
    docs = hash_sample(_t(spark, sf_dir, "documents"), "doc_id", 0.5)
    sig = simhash(docs, "text", hasher="md5")
    return simhash_near_dups(sig, "doc_id", max_hamming=8, bits=60).orderBy(
        "id_a", "id_b"
    )


PIPE_SIMHASH_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     x -> x != '') AS ws
  FROM documents
  WHERE substr(md5(doc_id::VARCHAR), 1, 4) < '8000'
), hs AS (
  SELECT doc_id,
         list_transform(ws, w -> ('0x' || substr(md5(w), 1, 15))::BIGINT) AS hh
  FROM norm
), sig AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 60), b ->
           CASE WHEN list_sum(list_transform(hh,
                  h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS sh
  FROM hs
), blocked AS (
  SELECT doc_id, sh, q.q, (sh >> (q.q * 15)) & 32767 AS qval
  FROM sig, (SELECT unnest(range(0, 4)) AS q) q
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sa, b.sh AS sb
  FROM blocked a JOIN blocked b
    ON a.q = b.q AND a.qval = b.qval AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM pairs WHERE bit_count(xor(sa, sb)) <= 8
ORDER BY id_a, id_b
"""

# Unsliced oracle for the Arrow twin: pipe_simhash_arrow keeps the FULL
# corpus (the numpy bit-vote kernel is ~20x faster than the interpreted
# JVM path, so the audit-time slice is only needed on the JVM parity
# twin above) — it must therefore pair with an oracle without the 50%
# hash-slice predicate.
PIPE_SIMHASH_FULL_SQL = PIPE_SIMHASH_SQL.replace(
    "\n  WHERE substr(md5(doc_id::VARCHAR), 1, 4) < '8000'", ""
)
assert PIPE_SIMHASH_FULL_SQL != PIPE_SIMHASH_SQL


# --------------------------------------------------------------------------
# Exact cosine top-k ANN (brute force baseline).
def pipe_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    return cosine_topk(emb.filter(F.col("vec_id") != 0), q, k=10)


PIPE_COSINE_TOPK_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], qv), 6) AS cosine
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


# --------------------------------------------------------------------------
# LSH-bucketed ANN. The hyperplanes are pure constants, so the oracle
# replays signature + bucket filter + exact rerank with the same plane
# literals.
def pipe_ann_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    return lsh_bucket_ann(emb.filter(F.col("vec_id") != 0), q, n_planes=4, k=10)


def _ann_lsh_sql() -> str:
    """The hyperplanes are pure constants (splitmix mix of (plane, dim)),
    so the oracle embeds the same plane literals and replays signature,
    bucket filter, and exact cosine rerank — dot products evaluate in the
    same sequential order in both engines, so doubles are identical."""
    from .operators.similarity import _planes

    planes = _planes(64, 4)

    def sig_expr(vec: str) -> str:
        terms = [
            f"(CASE WHEN list_inner_product({vec}, [{', '.join(repr(v) for v in pl)}]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, pl in enumerate(planes)
        ]
        return " + ".join(terms)

    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id != 0
),
sig AS (SELECT vec_id, v, {sig_expr('v')} AS bucket FROM corpus),
qb AS (SELECT {sig_expr('qv')} AS bucket FROM q)
SELECT s.vec_id,
       round(list_inner_product(s.v, q.qv)
             / (sqrt(list_inner_product(s.v, s.v)) * sqrt(list_inner_product(q.qv, q.qv))),
             6) AS cosine
FROM sig s, q, qb
WHERE s.bucket = qb.bucket
ORDER BY cosine DESC, s.vec_id
LIMIT 10
"""


PIPE_ANN_LSH_SQL = _ann_lsh_sql()


# --------------------------------------------------------------------------
# IVF-bucketed ANN: coarse cells from deterministic centroid seeds, probe
# the 2 nearest cells, exact rerank inside (oracle below re-derives the
# quantizer from the data; exactness vs brute force when probing all
# cells is pinned in tests/test_round2.test_ivf_full_probe_equals_exact).
def pipe_ann_ivf(spark, sf_dir):
    from .operators.similarity import ivf_ann

    emb = _t(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    return ivf_ann(emb.filter(F.col("vec_id") != 0), q, n_list=8, n_probe=2, k=10)


# Oracle: the coarse quantizer is fully data-derived but deterministic —
# seeds are the first 8 corpus vectors by id (vec_id 1..8, cell = id-1),
# assignment is argmin over (-cos, cell) structs (tie → lowest cell),
# probes are the 2 cells nearest the query. DuckDB re-derives all of it;
# the row_number ORDER BY (cs DESC, c) mirrors Spark's
# array_sort-of-(-cos, cell)-structs tie rule.
PIPE_ANN_IVF_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
cents AS (
  SELECT vec_id - 1 AS c, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id BETWEEN 1 AND 8
),
corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id != 0
),
cosd AS (
  SELECT corpus.vec_id, cents.c,
         list_inner_product(v, cv)
           / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(cv, cv))) AS cs
  FROM corpus, cents
),
assigned AS (
  SELECT vec_id, c AS cell FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c) AS rn
    FROM cosd
  ) WHERE rn = 1
),
probe AS (
  SELECT cents.c,
         list_inner_product(qv, cv)
           / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS cs
  FROM cents, q
  ORDER BY cs DESC, cents.c LIMIT 2
)
SELECT corpus.vec_id,
       round(list_inner_product(v, qv)
             / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv))),
             6) AS cosine
FROM corpus JOIN assigned USING (vec_id), q
WHERE assigned.cell IN (SELECT c FROM probe)
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


# --------------------------------------------------------------------------
# Embedding near-duplicate pairs, exact O(n²) variant (oracle-paired).
def pipe_cosine_neardup(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(emb, dim=64, threshold=0.45, exact=True).orderBy(
        "id_a", "id_b"
    )


PIPE_COSINE_NEARDUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45
ORDER BY id_a, id_b
"""


# --------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023): k-means cluster -> within-cluster cosine
# -> drop rows with a lower-id near-duplicate. Cluster-bounded pairwise
# (n²/k), codegen assignment, LeftAnti drop — operators/semdedup.py.
def pipe_semantic_dedup(spark, sf_dir):
    from .operators.semdedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, n_clusters=8, threshold=0.4)
    return out.select(
        "vec_id", "label", F.col("ivf_cell").cast("long").alias("cell")
    ).orderBy("vec_id")


# Oracle: fully re-derived — seeds are the first 8 vectors by id (cell =
# vec_id), assignment is argmax cosine (tie -> lowest cell, mirroring
# Spark's array_sort of (-cos, cell) structs), the dup rule is "exists a
# lower-id same-cell neighbor with cosine >= threshold".
PIPE_SEMANTIC_DEDUP_SQL = """
WITH cents AS (
  SELECT vec_id AS c, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 8
),
corpus AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
cosd AS (
  SELECT corpus.vec_id, cents.c,
         list_inner_product(v, cv)
           / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(cv, cv))) AS cs
  FROM corpus, cents
),
assigned AS (
  SELECT vec_id, c AS cell FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c) AS rn
    FROM cosd
  ) WHERE rn = 1
),
dups AS (
  SELECT DISTINCT b.vec_id AS vec_id
  FROM corpus a
  JOIN assigned ca ON ca.vec_id = a.vec_id
  JOIN assigned cb ON cb.cell = ca.cell
  JOIN corpus b ON b.vec_id = cb.vec_id
  WHERE a.vec_id < b.vec_id
    AND list_inner_product(a.v, b.v)
        / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) >= 0.4
)
SELECT corpus.vec_id, corpus.label, assigned.cell
FROM corpus JOIN assigned USING (vec_id)
WHERE corpus.vec_id NOT IN (SELECT vec_id FROM dups)
ORDER BY vec_id
"""


# --------------------------------------------------------------------------
# Per-label embedding centroids (posexplode → group avg).
def pipe_emb_centroid(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("c"))
        .groupBy("label")
        .agg(F.round(F.sum("c"), 4).alias("centroid_mass"), F.count("*").alias("dims"))
        .orderBy("label")
    )


PIPE_EMB_CENTROID_SQL = """
WITH flat AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding::DOUBLE[]) AS v
  FROM embeddings
), cent AS (
  SELECT label, pos, round(avg(v), 6) AS c FROM flat GROUP BY label, pos
)
SELECT label, round(sum(c), 4) AS centroid_mass, count(*) AS dims
FROM cent GROUP BY label ORDER BY label
"""


# --------------------------------------------------------------------------
# Token counting per language (whitespace + BPE-ish regex proxy).
def pipe_text_tokens(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            token_count(F.col("text")).alias("toks"),
            bpe_ish_token_count(F.col("text")).alias("btoks"),
        )
        .groupBy("lang")
        .agg(
            F.sum("toks").alias("total_tokens"),
            F.sum("btoks").alias("total_bpe_tokens"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("lang")
    )


PIPE_TEXT_TOKENS_SQL = """
SELECT lang,
       CAST(sum(len(list_filter(string_split(lower(text), ' '), w -> w != ''))) AS BIGINT) AS total_tokens,
       CAST(sum(len(list_filter(regexp_split_to_array(regexp_replace(lower(text), '([^a-z0-9\\s])', ' \\1 ', 'g'), '\\s+'), w -> w != ''))) AS BIGINT) AS total_bpe_tokens,
       count(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# Quality features aggregated per source.
def pipe_text_quality(spark, sf_dir):
    docs = quality_features(_t(spark, sf_dir, "documents"))
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("words"),
            F.round(F.round(F.sum("punct_ratio"), 4) / F.count("*"), 6).alias("avg_punct"),
            F.round(F.round(F.sum("stopword_ratio"), 4) / F.count("*"), 6).alias("avg_stop"),
            F.round(F.round(F.sum("avg_word_len"), 4) / F.count("*"), 6).alias("avg_wlen"),
        )
        .orderBy("source")
    )


PIPE_TEXT_QUALITY_SQL = """
WITH feats AS (
  SELECT source,
         list_filter(string_split(lower(text), ' '), w -> w != '') AS words,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS n_punct
  FROM documents
), per_doc AS (
  SELECT source, len(words) AS n_words,
         round(n_punct * 1.0 / greatest(n_chars, 1), 4) AS punct_ratio,
         round(len(list_filter(words, w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) * 1.0
               / greatest(len(words), 1), 4) AS stopword_ratio,
         round(CASE WHEN len(words) > 0
               THEN list_sum(list_transform(words, w -> length(w))) * 1.0 / len(words)
               ELSE 0.0 END, 4) AS avg_word_len
  FROM feats
)
SELECT source, count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS words,
       round(round(sum(punct_ratio), 4) / count(*), 6) AS avg_punct,
       round(round(sum(stopword_ratio), 4) / count(*), 6) AS avg_stop,
       round(round(sum(avg_word_len), 4) / count(*), 6) AS avg_wlen
FROM per_doc GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# Language-ID heuristic vs labeled lang (confusion counts).
def pipe_langid(spark, sf_dir):
    docs = language_id(_t(spark, sf_dir, "documents"))
    return (
        docs.groupBy(F.col("lang").alias("true_lang"), F.col("lang_pred"))
        .agg(F.count("*").alias("n"))
        .orderBy("true_lang", "lang_pred")
    )


def _langid_sql() -> str:
    """The stopword-overlap argmax is hash-free, so DuckDB replays it
    exactly: same token split, same per-language overlap fractions, same
    sorted-struct max (ties → lexicographically largest lang)."""
    from .operators.text import STOPWORDS

    structs = ", ".join(
        "{{'score': CAST(len(list_filter(ws, w -> list_contains([{stops}], w))) AS DOUBLE)"
        " / greatest(len(ws), 1), 'lang': '{lang}'}}".format(
            stops=",".join("'" + w + "'" for w in stops), lang=lang
        )
        for lang, stops in sorted(STOPWORDS.items())
    )
    return rf"""
WITH norm AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS ws
  FROM documents
), scored AS (
  SELECT doc_id, lang, list_reverse(list_sort([{structs}]))[1] AS best FROM norm
)
SELECT lang AS true_lang, best.lang AS lang_pred, CAST(count(*) AS BIGINT) AS n
FROM scored GROUP BY 1, 2 ORDER BY 1, 2
"""


PIPE_LANGID_SQL = _langid_sql()


# --------------------------------------------------------------------------
# Document fingerprinting: distinct fingerprints per source (md5-based).
def pipe_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("source", doc_fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(F.countDistinct("fp").alias("n_unique"), F.count("*").alias("n_docs"))
        .orderBy("source")
    )


PIPE_FINGERPRINT_SQL = """
SELECT source,
       count(DISTINCT substring(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 16)) AS n_unique,
       count(*) AS n_docs
FROM documents GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# Transitive dedup clustering: connected components over near-dup pairs
# (Jaccard >= 0.8), every doc assigned min-reachable-id as its cluster.
# Spark side is iterative min-label propagation (operators/cluster.py);
# oracle is a DuckDB recursive-CTE reachability closure — same fixpoint.
def pipe_dedup_cluster(spark, sf_dir):
    from .operators.cluster import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8)
    return dedup_clusters(docs, pairs).orderBy("doc_id")


_JACCARD_PAIRS_08 = """
  WITH words AS (
    SELECT doc_id, unnest(list_distinct(list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), w -> w != ''))) AS w
    FROM documents
  ), sizes AS (
    SELECT doc_id, count(*) AS sz FROM words GROUP BY doc_id
  ), ov AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
    FROM words a JOIN words b USING (w)
    WHERE a.doc_id < b.doc_id GROUP BY 1, 2
  )
  SELECT id_a, id_b
  FROM ov JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.8
"""

PIPE_DEDUP_CLUSTER_SQL = f"""
WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_08}),
edges AS (SELECT id_a AS s, id_b AS d FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
walk AS (
  SELECT s AS n, s AS r FROM edges
  UNION
  SELECT w.n, e.d FROM walk w JOIN edges e ON e.s = w.r
)
SELECT d.doc_id, coalesce(min(w.r), d.doc_id) AS cluster_id
FROM documents d LEFT JOIN walk w ON w.n = d.doc_id
GROUP BY d.doc_id ORDER BY d.doc_id
"""


# --------------------------------------------------------------------------
# Deterministic hash sampling: ~10% of docs by md5(doc_id) hex prefix —
# reproducible across runs, engines, and partition layouts (df.sample is
# none of those). Map-only filter.
def pipe_sample_hash(spark, sf_dir):
    from .operators.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.1).select("doc_id", "source").orderBy("doc_id")


PIPE_SAMPLE_HASH_SQL = """
SELECT doc_id, source FROM documents
WHERE substr(md5(doc_id::VARCHAR), 1, 4) < '1999'
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Per-domain cap: keep the 5 largest docs per source (rank window, one
# shuffle on source) — the per-host cap step of a crawl-curation pipeline.
def pipe_domain_cap(spark, sf_dir):
    from .operators.sampling import domain_cap

    docs = _t(spark, sf_dir, "documents")
    return (
        domain_cap(docs, "source", 5)
        .select("source", "doc_id", "n_chars", "rank_in_domain")
        .orderBy("source", "rank_in_domain")
    )


PIPE_DOMAIN_CAP_SQL = """
SELECT source, doc_id, n_chars, rank_in_domain FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank_in_domain
  FROM documents
) WHERE rank_in_domain <= 5
ORDER BY source, rank_in_domain
"""


# --------------------------------------------------------------------------
# Token-budget packing: docs laid out in id order per source, assigned to
# 2000-token context-window bins by start offset (window cumsum — the
# parallelizable relaxation of greedy packing).
def pipe_token_pack(spark, sf_dir):
    from .operators.sampling import token_pack

    docs = _t(spark, sf_dir, "documents").withColumn("tokens", token_count(F.col("text")))
    return (
        token_pack(docs, "tokens", 2000, group_col="source")
        .select("doc_id", "source", "tokens", "pack_bin")
        .orderBy("doc_id")
    )


PIPE_TOKEN_PACK_SQL = """
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split(lower(text), ' '), w -> w != '')) AS tokens
  FROM documents
)
SELECT doc_id, source, tokens,
       CAST(floor((sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - tokens) / 2000.0) AS BIGINT) AS pack_bin
FROM toks ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Repetition signals (Gopher-style): duplicate word / bigram fractions per
# doc, aggregated per source with a flag count at the 0.2 threshold.
def pipe_repetition(spark, sf_dir):
    from .operators.text import repetition_features

    docs = repetition_features(_t(spark, sf_dir, "documents"))
    return (
        docs.groupBy("source")
        .agg(
            F.round(F.round(F.sum("dup_word_frac"), 4) / F.count("*"), 6).alias("avg_dup_word"),
            F.round(F.round(F.sum("dup_2gram_frac"), 4) / F.count("*"), 6).alias("avg_dup_2gram"),
            F.sum(F.when(F.col("dup_word_frac") > 0.2, 1).otherwise(0)).alias("n_flagged"),
        )
        .orderBy("source")
    )


PIPE_REPETITION_SQL = """
WITH per_doc AS (
  SELECT source,
         list_filter(string_split(lower(text), ' '), w -> w != '') AS w
  FROM documents
), feats AS (
  SELECT source,
         CASE WHEN len(w) > 0
              THEN round(1.0 - len(list_distinct(w)) / len(w), 4) ELSE 0.0 END AS dup_word_frac,
         CASE WHEN len(w) > 1
              THEN round(1.0 - len(list_distinct(list_transform(range(1, len(w)), i -> w[i] || '_' || w[i+1])))
                         / (len(w) - 1), 4) ELSE 0.0 END AS dup_2gram_frac
  FROM per_doc
)
SELECT source,
       round(round(sum(dup_word_frac), 4) / count(*), 6) AS avg_dup_word,
       round(round(sum(dup_2gram_frac), 4) / count(*), 6) AS avg_dup_2gram,
       CAST(sum(CASE WHEN dup_word_frac > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM feats GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# The full scale-path dedup, end to end: MinHash signatures → LSH banding
# → candidate pairs → connected components → canonical doc per cluster →
# per-source survival counts. This is the pipeline that replaces the
# O(n²) exact join at 100 TB. md5 hasher mode + a recursive-CTE closure
# lets DuckDB re-derive the whole thing (the exact-Jaccard twin
# pipe_dedup_cluster cross-checks with hash-free pair generation).
def pipe_minhash_cluster(spark, sf_dir):
    from .operators.cluster import dedup_clusters
    from .operators.dedup import lsh_star_edges

    docs = _t(spark, sf_dir, "documents")
    # md5 hasher: signatures (and so buckets, edges, components) are
    # reproducible in DuckDB — the oracle re-derives the LSH pairs, takes
    # the recursive reachability closure, and aggregates the same stats
    sig = minhash_signature(docs, "text", num_hashes=32, shingle_k=1, hasher="md5")
    # star edges (bucket-min → member): identical connected components to
    # the all-pairs bucket clique, linear instead of quadratic per bucket
    pairs = lsh_star_edges(sig, "doc_id", num_bands=8)
    clustered = dedup_clusters(docs, pairs)
    survived = F.sum(
        F.when(F.col("doc_id") == F.col("cluster_id"), 1).otherwise(0)
    )
    return (
        docs.select("doc_id", "source")
        .join(clustered, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            survived.alias("n_kept"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .orderBy("source")
    )


PIPE_MINHASH_CLUSTER_SQL = r"""
WITH RECURSIVE norm AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     x -> x != '') AS ws
  FROM documents
), sig AS (
  SELECT doc_id,
         list_transform(range(0, 32), i ->
           list_min(list_transform(ws,
             s -> ('0x' || substr(md5(s || '#' || i::VARCHAR), 1, 8))::BIGINT))) AS mh
  FROM norm
), banded AS (
  SELECT doc_id, b.band,
         array_to_string(mh[b.band * 4 + 1 : b.band * 4 + 4], ',') AS key
  FROM sig, (SELECT unnest(range(0, 8)) AS band) b
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM banded a JOIN banded c
    ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), walk AS (
  SELECT s AS n, s AS r FROM edges
  UNION
  SELECT w.n, e.d FROM walk w JOIN edges e ON e.s = w.r
), comp AS (
  SELECT d.doc_id, coalesce(min(w.r), d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN walk w ON w.n = d.doc_id
  GROUP BY d.doc_id
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN c.doc_id = c.cluster_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(count(DISTINCT c.cluster_id) AS BIGINT) AS n_clusters
FROM comp c JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""


# --------------------------------------------------------------------------
# Benchmark decontamination: corpus docs sharing any word 3-gram with the
# (tiny, broadcast) eval slice doc_id%97==0. Corpus side is map-only into
# a broadcast hash join — no corpus shuffle; only per-doc counts shuffle.
def pipe_decontaminate(spark, sf_dir):
    from .operators.decontaminate import contamination_report

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_report(corpus, eval_df, n=3).orderBy("doc_id")


PIPE_DECONTAMINATE_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     w -> w != '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws)-1)])) AS ngram
  FROM norm WHERE len(ws) >= 3
),
eval_grams AS (SELECT DISTINCT ngram FROM grams WHERE doc_id % 97 = 0),
corpus_grams AS (SELECT doc_id, ngram FROM grams WHERE doc_id % 97 <> 0)
SELECT doc_id, count(*) AS n_collisions
FROM corpus_grams JOIN eval_grams USING (ngram)
GROUP BY doc_id HAVING count(*) >= 1 ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Stratified (per-source) deterministic sampling: corpus mixing weights as
# md5-threshold filters — map-only, reproducible, nested across rates.
def pipe_sample_stratified(spark, sf_dir):
    from .operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
    return (
        stratified_sample(docs, "source", rates, "doc_id", default_rate=0.05)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.min("doc_id").alias("min_id"))
        .orderBy("source")
    )


PIPE_SAMPLE_STRATIFIED_SQL = """
SELECT source, count(*) AS n_kept, min(doc_id) AS min_id
FROM documents
WHERE substr(md5(doc_id::VARCHAR), 1, 4) <
      CASE source WHEN 'src0' THEN 'g' WHEN 'src1' THEN '8000'
                  WHEN 'src2' THEN '4000' ELSE '0ccc' END
GROUP BY source ORDER BY source
"""


def pipe_mixture_sample(spark, sf_dir):
    """Temperature-weighted corpus mixing (quota ∝ count^0.5 per source).

    The multi-source smoothing step of a training-data pipeline:
    small sources are up-weighted relative to raw share. Selection is
    hash-ranked (md5) so the draw is deterministic across engines —
    the oracle re-derives the same quotas and kept set in SQL.
    """
    from .operators.sampling import mixture_sample

    docs = _t(spark, sf_dir, "documents")
    return (
        mixture_sample(docs, "source", "doc_id", total=1000, alpha=0.5)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
        )
        .orderBy("source")
    )


PIPE_MIXTURE_SAMPLE_SQL = """
WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
n AS (SELECT sum(sqrt(cnt)) AS norm FROM c),
q AS (SELECT source, CAST(floor(1000.0 * sqrt(cnt) / norm + 1e-6) AS BIGINT) AS quota
      FROM c, n),
r AS (SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
SELECT r.source, count(*) AS n_kept,
       CAST(sum(r.n_chars) AS BIGINT) AS sum_chars, min(r.doc_id) AS min_id
FROM r JOIN q USING (source)
WHERE r.rk <= q.quota
GROUP BY r.source ORDER BY r.source
"""


# --------------------------------------------------------------------------
# Hashed-bag-of-words linear quality scoring (fastText/CCNet filter
# shape): md5-bucketed features, weights as a literal array, sigmoid
# calibration — pure map, scores at scan speed. Oracle recomputes the
# identical arithmetic in DuckDB (portable md5 hasher mode).
def pipe_quality_score(spark, sf_dir):
    from .operators.scoring import demo_weights, score_linear

    docs = _t(spark, sf_dir, "documents")
    scored = score_linear(docs, "text", demo_weights(64), hasher="md5")
    return scored.select(
        "doc_id", F.round(F.col("score"), 6).alias("score")
    ).orderBy("doc_id")


def _quality_score_sql() -> str:
    from .operators.scoring import demo_weights

    warr = ", ".join(repr(w) for w in demo_weights(64))
    return rf"""
WITH w AS (SELECT [{warr}]::DOUBLE[] AS warr),
norm AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     x -> x != '') AS ws
  FROM documents
),
scored AS (
  SELECT doc_id,
         CASE WHEN len(ws) > 0 THEN
           list_sum(list_transform(ws,
             x -> warr[(('0x' || substr(md5(x), 1, 8))::BIGINT % 64) + 1])) / len(ws)
         ELSE 0.0 END AS raw
  FROM norm, w
)
SELECT doc_id, round(1.0 / (1.0 + exp(-raw)), 6) AS score
FROM scored ORDER BY doc_id
"""


PIPE_QUALITY_SCORE_SQL = _quality_score_sql()


# --------------------------------------------------------------------------
# Int8 embedding quantization audit: exact integer codes (order-free sum)
# plus per-vector reconstruction RMSE. floor(x+0.5) tie rule makes the
# arithmetic engine-portable; oracle recomputes it in DuckDB.
def pipe_emb_quant(spark, sf_dir):
    from .operators.quantize import quantize_embeddings, reconstruction_rmse

    emb = _t(spark, sf_dir, "embeddings")
    r = reconstruction_rmse(quantize_embeddings(emb))
    code_sum = F.aggregate(
        F.col("q_emb"), F.lit(0).cast("long"), lambda a, v: a + v.cast("long")
    )
    return r.select(
        "vec_id",
        code_sum.alias("code_sum"),
        F.round(F.col("recon_rmse"), 6).alias("rmse"),
    ).orderBy("vec_id")


PIPE_EMB_QUANT_SQL = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS x,
         list_max(list_transform(embedding, v -> abs(v::DOUBLE))) AS mx
  FROM embeddings
),
q AS (
  SELECT vec_id, x,
         CASE WHEN mx > 0 THEN mx / 127.0 ELSE 0.0 END AS scale,
         CASE WHEN mx > 0
              THEN list_transform(x, v -> greatest(-127, least(127,
                     CAST(floor(v / (mx / 127.0) + 0.5) AS INT))))
              ELSE list_transform(x, v -> 0) END AS code
  FROM base
)
SELECT vec_id,
       CAST(list_sum(code) AS BIGINT) AS code_sum,
       round(sqrt(list_sum(list_transform(range(1, len(x) + 1),
                                          i -> (x[i] - code[i] * scale) ^ 2)) / len(x)), 6) AS rmse
FROM q ORDER BY vec_id
"""


# --------------------------------------------------------------------------
# Mergeable HLL distinct-count rollup: per-day sketches of user_id, merged
# to a global estimate — the one-scan rollup pattern for 100 TB. Oracle is
# the exact distinct count; the Spark side emits tolerance/consistency
# booleans (est within 5%, merged == direct-sketch estimate) so the sketch
# behavior itself is on the oracle record.
def pipe_hll_rollup(spark, sf_dir):
    from .operators.sketches import hll_estimate, hll_merge, hll_partial

    ev = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    fine = hll_partial(ev, ["day"], "user_id")
    exact = ev.groupBy("day").agg(F.countDistinct("user_id").alias("n_exact"))
    per_day = (
        fine.select("day", hll_estimate("hll_sketch").alias("est"))
        .join(exact, "day")
        .select(
            "day",
            "n_exact",
            (
                F.abs(F.col("est") - F.col("n_exact")) <= 0.05 * F.col("n_exact")
            ).alias("est_ok"),
        )
    )
    tot_exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    merged = hll_merge(fine, []).select(hll_estimate("hll_sketch").alias("est_m"))
    direct = hll_partial(ev, [], "user_id").select(
        hll_estimate("hll_sketch").alias("est_d")
    )
    total = (
        tot_exact.crossJoin(merged)
        .crossJoin(direct)
        .select(
            F.lit("TOTAL").alias("day"),
            "n_exact",
            # merged-sketch estimate within tolerance of exact AND close to
            # the direct single-sketch estimate (sparse→dense promotion in
            # the union makes bit-equality too strict)
            (
                (F.abs(F.col("est_m") - F.col("n_exact")) <= 0.05 * F.col("n_exact"))
                & (F.abs(F.col("est_m") - F.col("est_d")) <= 0.02 * F.col("n_exact"))
            ).alias("est_ok"),
        )
    )
    return per_day.unionByName(total).orderBy("day")


PIPE_HLL_ROLLUP_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(DISTINCT user_id)::BIGINT AS n_exact, TRUE AS est_ok
FROM events GROUP BY 1
UNION ALL
SELECT 'TOTAL', count(DISTINCT user_id)::BIGINT, TRUE FROM events
ORDER BY day
"""


# --------------------------------------------------------------------------
# TF-IDF: top-2 most characteristic terms per document. The corpus pays
# one (doc, term) shuffle; df/N statistics broadcast back in; per-doc
# top-k is a WindowGroupLimit-prunable row_number.
def pipe_tfidf(spark, sf_dir):
    from .operators.ranking import tf_idf

    docs = _t(spark, sf_dir, "documents")
    return tf_idf(docs, "doc_id", "text", top_terms=2).orderBy("doc_id", "term")


PIPE_TFIDF_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     w -> w != '') AS ws
  FROM documents
),
tfc AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(ws) AS term FROM norm) GROUP BY 1, 2
),
dfc AS (SELECT term, count(*)::BIGINT AS df FROM tfc GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
         round((1.0 + ln(tf)) * ln((1.0 + n_docs) / (1.0 + df)), 6) AS tfidf
  FROM tfc JOIN dfc USING (term), n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf FROM ranked WHERE rk <= 2 ORDER BY doc_id, term
"""


# --------------------------------------------------------------------------
# BM25 relevance of every document to a bag-of-terms query (Robertson /
# Lucene positive-idf form, k1=1.2 b=0.75). Corpus tf rows are filtered to
# the query's terms before aggregating; (term, df) and (N, avgdl) broadcast.
def pipe_bm25(spark, sf_dir):
    from .operators.ranking import bm25

    docs = _t(spark, sf_dir, "documents")
    return bm25(docs, "doc_id", "text", ["spark", "vector", "query"])


PIPE_BM25_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     w -> w != '') AS ws
  FROM documents
),
tfc AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(ws) AS term FROM norm) GROUP BY 1, 2
),
dl AS (SELECT doc_id, len(ws)::BIGINT AS dl FROM norm),
stats AS (SELECT count(*) AS n_docs, avg(len(ws)) AS avgdl FROM norm),
qt AS (SELECT * FROM tfc WHERE term IN ('spark', 'vector', 'query')),
dfc AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM qt GROUP BY 1)
SELECT doc_id,
       round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf * (1.2 + 1.0)
                 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
FROM qt JOIN dfc USING (term) JOIN dl USING (doc_id), stats
GROUP BY doc_id ORDER BY bm25 DESC, doc_id
"""


# --------------------------------------------------------------------------
# Context-window chunking: 40-token windows, 8-token overlap (stride 32).
# Map-only array math + one posexplode; chunk text compared by md5.
def pipe_chunk(spark, sf_dir):
    from .operators.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ch = chunk_documents(docs, "doc_id", "text", chunk_tokens=40, overlap=8)
    return ch.select(
        "doc_id",
        "chunk_id",
        F.col("chunk_tokens").alias("n_tok"),
        F.md5("chunk_text").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


PIPE_CHUNK_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     w -> w != '') AS ws
  FROM documents
),
ch AS (
  SELECT doc_id,
         [array_to_string(ws[s:s+39], ' ') for s in range(1, len(ws)+1, 32)] AS chunks
  FROM norm WHERE len(ws) > 0
),
rows_ AS (
  SELECT doc_id, generate_subscripts(chunks, 1) - 1 AS chunk_id,
         unnest(chunks) AS chunk
  FROM ch
)
SELECT doc_id, chunk_id::INTEGER AS chunk_id,
       len(string_split(chunk, ' '))::BIGINT AS n_tok, md5(chunk) AS chunk_md5
FROM rows_ ORDER BY doc_id, chunk_id
"""


# --------------------------------------------------------------------------
# Deterministic corpus shuffle (training order): md5(salt||id) total order.
# The first-100 set + keys pins the permutation cross-engine.
def pipe_shuffle_order(spark, sf_dir):
    from .operators.sampling import deterministic_shuffle

    docs = _t(spark, sf_dir, "documents")
    return (
        deterministic_shuffle(docs, "doc_id", salt="epoch0", keep_key=True)
        .select("doc_id", "shuffle_key")
        .limit(100)
    )


PIPE_SHUFFLE_ORDER_SQL = """
SELECT doc_id, md5('epoch0' || doc_id::VARCHAR) AS shuffle_key
FROM documents ORDER BY shuffle_key LIMIT 100
"""


# --------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection 64→8 dims: deterministic ±1 signs
# from md5 parity (engine-portable), pure map fold. Oracle recomputes the
# identical projection via list_inner_product against the same sign matrix.
def pipe_rand_proj(spark, sf_dir):
    from .operators.projection import random_projection

    emb = _t(spark, sf_dir, "embeddings")
    proj = random_projection(emb, "embedding", out_dim=8, seed=42)
    return proj.select(
        "vec_id", F.posexplode("proj").alias("dim", "comp")
    ).orderBy("vec_id", "dim")


def _rand_proj_sql() -> str:
    from .operators.projection import projection_signs

    signs = projection_signs(64, 8, seed=42)
    rows = ",\n".join(
        f"({j}, [{', '.join(repr(v) for v in row)}]::DOUBLE[])"
        for j, row in enumerate(signs)
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS x FROM embeddings)
SELECT vec_id, dim::INTEGER AS dim,
       round(list_inner_product(x, sv) * 0.125, 6) AS comp
FROM e, (VALUES {rows}) AS signs(dim, sv)
ORDER BY vec_id, dim
"""


PIPE_RAND_PROJ_SQL = _rand_proj_sql()


# --------------------------------------------------------------------------
# Fuzzy entity matching: q-gram-blocked levenshtein pairs over distinct
# part names. Oracle is the EXACT all-pairs join — q=2/d=2 blocking is
# provably lossless at these string lengths (min 7 chars), so the gate
# also proves the block loses no true pair.
def pipe_fuzzy_match(spark, sf_dir):
    from .operators.fuzzy import fuzzy_self_pairs

    names = _t(spark, sf_dir, "part").select("p_name").distinct()
    return fuzzy_self_pairs(
        names.withColumn("name", F.col("p_name")), "name", "p_name", max_distance=2
    ).select(
        F.col("id_a").alias("name_a"), F.col("id_b").alias("name_b"), "dist"
    ).orderBy("name_a", "name_b")


PIPE_FUZZY_MATCH_SQL = """
WITH n AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name)::INT AS dist
FROM n a JOIN n b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
ORDER BY name_a, name_b
"""


# --------------------------------------------------------------------------
# Bigram-LM perplexity (CCNet-style quality filter): train counts on the
# even-id half of the corpus, score the odd-id half; add-k smoothing keeps
# the arithmetic engine-portable and the oracle replays it exactly.
def pipe_perplexity(spark, sf_dir):
    from .operators.lm import perplexity, train_bigram_counts

    docs = _t(spark, sf_dir, "documents")
    model = train_bigram_counts(docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text")
    out = perplexity(docs.filter(F.col("doc_id") % 2 == 1), model, "doc_id", "text")
    return out.select(
        "doc_id", F.round("ppl", 4).alias("ppl"), "n_bigrams"
    ).orderBy("doc_id")


PIPE_PERPLEXITY_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     w -> w != '') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id, unnest(ws[1:len(ws)-1]) AS prev, unnest(ws[2:len(ws)]) AS word
  FROM norm WHERE len(ws) >= 2
),
c2t AS (
  SELECT prev, word, count(*)::BIGINT AS c2 FROM bg WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
c1t AS (
  SELECT prev, count(*)::BIGINT AS c1 FROM bg WHERE doc_id % 2 = 0 GROUP BY 1
),
vt AS (SELECT count(DISTINCT word) AS v FROM c2t)
SELECT doc_id,
       round(exp(-avg(ln((coalesce(c2, 0) + 0.5) / (coalesce(c1, 0) + 0.5 * v)))), 4) AS ppl,
       count(*)::BIGINT AS n_bigrams
FROM (SELECT * FROM bg WHERE doc_id % 2 = 1) s
LEFT JOIN c2t USING (prev, word)
LEFT JOIN c1t USING (prev), vt
GROUP BY doc_id ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Incremental (cross-batch) dedup: a "new batch" of 150 docs — 100 are
# case-mangled twins of history docs (normalization catches them), 50 are
# genuinely new — anti-joined against the historical fingerprint set.
def pipe_dedup_incremental(spark, sf_dir):
    from .operators.dedup import incremental_dedup

    docs = _t(spark, sf_dir, "documents")
    newb = (
        docs.filter(F.col("doc_id") < 100)
        .select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.upper(F.col("text")).alias("text"),
        )
        .unionByName(
            docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150)).select(
                (F.col("doc_id") + 20000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz-new-suffix")).alias("text"),
            )
        )
    )
    return incremental_dedup(
        newb, docs, "text", "doc_id", broadcast_history=True
    ).orderBy("keep_id")


PIPE_DEDUP_INCREMENTAL_SQL = r"""
WITH newb AS (
  SELECT doc_id + 10000 AS doc_id, upper(text) AS text
  FROM documents WHERE doc_id < 100
  UNION ALL
  SELECT doc_id + 20000, text || ' zz-new-suffix'
  FROM documents WHERE doc_id >= 100 AND doc_id < 150
),
keyed AS (
  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS dup_key, doc_id
  FROM newb
),
seen AS (
  SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS dup_key
  FROM documents
)
SELECT dup_key, min(doc_id) AS keep_id, count(*) AS n_dups
FROM keyed WHERE dup_key NOT IN (SELECT dup_key FROM seen)
GROUP BY dup_key ORDER BY keep_id
"""


# --------------------------------------------------------------------------
# Z-order (Morton) clustering key: bit-interleave of two bucketized key
# columns — the multi-column data-skipping layout. The arithmetic is pure
# integer shift/and/or (codegen, map-only); the oracle recomputes the
# identical interleave in DuckDB.
def pipe_zorder_layout(spark, sf_dir):
    from .operators.layout import zvalue

    ev = _t(spark, sf_dir, "events")
    z = zvalue(
        [F.pmod(F.col("user_id"), F.lit(16)), F.pmod(F.col("event_id"), F.lit(16))],
        bits=4,
    )
    return ev.select(z.alias("z")).groupBy("z").agg(
        F.count("*").alias("n")
    ).orderBy("z")


def _zorder_sql() -> str:
    terms = []
    for b in range(4):
        terms.append(f"((((user_id % 16) >> {b}) & 1) << {2 * b})")
        terms.append(f"((((event_id % 16) >> {b}) & 1) << {2 * b + 1})")
    expr = " | ".join(terms)
    return (
        f"SELECT ({expr})::BIGINT AS z, count(*) AS n "
        "FROM events GROUP BY 1 ORDER BY z"
    )


PIPE_ZORDER_SQL = _zorder_sql()


# --------------------------------------------------------------------------
# Exact substring (k-token span) dedup — Lee et al. 2022 reshaped as a
# hashed span inverted index (operators/substring.py). md5 hasher mode
# makes the span keys bit-identical in DuckDB, so the oracle recomputes
# the full pipeline independently (its own tokenize/slice/hash/count).
def pipe_substring_dup(spark, sf_dir):
    from .operators.substring import duplicate_spans

    from .operators.substring import span_index

    docs = _t(spark, sf_dir, "documents")
    dup = duplicate_spans(docs, k=10, hasher="md5")
    all_spans = span_index(docs, k=10, hasher="md5").groupBy("doc_id").agg(
        F.count("*").alias("n_spans")
    )
    per_doc = (
        dup.groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_spans"))
        .join(all_spans, "doc_id")
        .select("doc_id", "n_spans", "n_dup_spans")
        .orderBy("doc_id")
    )
    return per_doc


PIPE_SUBSTRING_DUP_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), spans AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         md5(array_to_string(t[u.i+1:u.i+10], ' ')) AS h
  FROM toks, UNNEST(range(0, GREATEST(len(t)-9, 0))) AS u(i)
), c AS (
  SELECT h, count(*) AS cnt FROM spans GROUP BY h
)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
FROM spans s JOIN c USING (h)
GROUP BY s.doc_id
HAVING n_dup_spans > 0
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# PII redaction: emails/phones/SSNs/IPs → [TAG] placeholders. The corpus
# text has no organic PII, so the gate injects deterministic PII derived
# from doc_id on BOTH sides and then runs the full redaction chain — the
# oracle genuinely exercises every regex, not just the no-op path.
# Map-only (chained regexp_replace in one codegen'd projection); at
# 100 TB this runs at scan speed with zero shuffles beyond the sort.
def pipe_pii_redact(spark, sf_dir):
    from .operators.text import redact_pii

    docs = _t(spark, sf_dir, "documents")
    injected = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.org or +1 (555) 867-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" / 555-867-0042, ssn 123-45-6789, host 10.1.2."),
            (F.col("doc_id") % 256).cast("string"),
        ),
    )
    red = redact_pii(injected, "text", count=True)
    return red.select(
        "doc_id",
        F.md5(F.col("text_redacted")).alias("clean_md5"),
        "n_email",
        "n_phone",
        "n_ssn",
        "n_ip",
    ).orderBy("doc_id")


def _pii_redact_sql() -> str:
    from .operators.text import _PII_PATTERNS

    inject = (
        "text || ' reach user' || CAST(doc_id AS VARCHAR) || "
        "'@example.org or +1 (555) 867-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
        "' / 555-867-0042, ssn 123-45-6789, host 10.1.2.' || "
        "CAST(doc_id % 256 AS VARCHAR)"
    )
    redacted = "injected"
    counts = []
    for tag, pat in _PII_PATTERNS:
        lit = pat.replace("'", "''")
        redacted = f"regexp_replace({redacted}, '{lit}', '[{tag}]', 'g')"
        counts.append(
            f"len(regexp_extract_all(injected, '{lit}'))::BIGINT AS n_{tag.lower()}"
        )
    return f"""
WITH inj AS (SELECT doc_id, {inject} AS injected FROM documents)
SELECT doc_id, md5({redacted}) AS clean_md5, {", ".join(counts)}
FROM inj ORDER BY doc_id
"""


PIPE_PII_REDACT_SQL = _pii_redact_sql()


# --------------------------------------------------------------------------
# Multimodal binary columns on the driver record. A deterministic
# grayscale image per document (w=8+doc_id%9, h=8+doc_id%7,
# pixel[y,x]=(doc_id+31y+7x)%256) is encoded by the pure-numpy PNG
# writer into a BINARY column, shuffled so the payload really crosses
# an exchange, then decoded back by the full PNG reader
# (operators/codecs.py) — per-image width/height/pixel-checksum must
# equal the oracle's closed-form arithmetic, so any bit the encoder,
# decoder, or binary transport drops is a red row. Arrow-batched
# mapInPandas at the declared slow-path boundary (no JVM PNG codec);
# both stages stream batches, nothing collects.
def pipe_image_roundtrip(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def enc(batches):
        import numpy as np
        import pandas as pd

        from datafusion_python_spark.operators.codecs import encode_png

        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            pngs = []
            for i in ids:
                w = 8 + int(i) % 9
                h = 8 + int(i) % 7
                y, x = np.mgrid[0:h, 0:w]
                img = ((int(i) + 31 * y + 7 * x) % 256).astype(np.uint8)
                pngs.append(encode_png(img))
            yield pd.DataFrame({"doc_id": ids, "png": pngs})

    staged = docs.mapInPandas(enc, "doc_id bigint, png binary").repartition(8, "doc_id")

    def dec(batches):
        import numpy as np
        import pandas as pd

        from datafusion_python_spark.operators.codecs import decode_png

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "pix_sum": []}
            for i, b in zip(pdf["doc_id"], pdf["png"]):
                img = decode_png(bytes(b))
                out["doc_id"].append(int(i))
                out["width"].append(int(img.shape[1]))
                out["height"].append(int(img.shape[0]))
                out["pix_sum"].append(int(img.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return (
        staged.mapInPandas(
            dec, "doc_id bigint, width bigint, height bigint, pix_sum bigint"
        )
        .orderBy("doc_id")
    )


PIPE_IMAGE_ROUNDTRIP_SQL = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents
), ys AS (
  SELECT doc_id, w, h, unnest(range(0, h)) AS gy FROM dims
), px AS (
  SELECT doc_id, w, h, gy, unnest(range(0, w)) AS gx FROM ys
)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(sum((doc_id + 31 * gy + 7 * gx) % 256) AS BIGINT) AS pix_sum
FROM px
GROUP BY doc_id, w, h
ORDER BY doc_id
"""



# --------------------------------------------------------------------------
# Arrow-kernel twins on the driver record. Each *_arrow gate runs the
# numpy/mapInArrow (or fused applyInPandas) kernel against the SAME
# DuckDB oracle as its JVM-path sibling — the kernels claim decision
# parity with the JVM paths (tests/test_similarity_arrow.py asserts it
# pairwise), and these gates put that claim on the driver's
# CORRECTNESS record instead of pytest-only.
def pipe_simhash_arrow(spark, sf_dir):
    from .operators.dedup import simhash_arrow

    docs = _t(spark, sf_dir, "documents")
    sig = simhash_arrow(docs, "text", hasher="md5")
    return simhash_near_dups(sig, "doc_id", max_hamming=8, bits=60).orderBy(
        "id_a", "id_b"
    )


def pipe_topk_arrow(spark, sf_dir):
    from .operators.similarity import cosine_topk_arrow

    emb = _t(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    return cosine_topk_arrow(emb.filter(F.col("vec_id") != 0), q, k=10)


def pipe_ann_ivf_arrow(spark, sf_dir):
    from .operators.similarity import ivf_ann

    emb = _t(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    return ivf_ann(
        emb.filter(F.col("vec_id") != 0), q, n_list=8, n_probe=2, k=10, arrow=True
    )


def pipe_semdedup_arrow(spark, sf_dir):
    from .operators.semdedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, n_clusters=8, threshold=0.4, arrow=True)
    return out.select(
        "vec_id", "label", F.col("ivf_cell").cast("long").alias("cell")
    ).orderBy("vec_id")


# Bucketed near-dup pairs through the per-bucket matmul kernel. The
# JVM-path sibling gate (pipe_cosine_neardup) runs the exact=True
# oracle fence; this one gates the PRODUCTION shape — LSH bucketing +
# within-bucket pairs — so the oracle replays the bucket signature with
# the same plane literals (the pipe_ann_lsh pattern).
def pipe_neardup_arrow(spark, sf_dir):
    from .operators.similarity import cosine_near_dup_pairs_arrow

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs_arrow(
        emb, dim=64, threshold=0.45, n_planes=4
    ).orderBy("id_a", "id_b")


def _neardup_bucketed_sql() -> str:
    from .operators.similarity import _planes

    planes = _planes(64, 4)

    def sig_expr(vec: str) -> str:
        terms = [
            f"(CASE WHEN list_inner_product({vec}, [{', '.join(repr(v) for v in pl)}]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, pl in enumerate(planes)
        ]
        return " + ".join(terms)

    return f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
sig AS (SELECT vec_id, v, {sig_expr('v')} AS bucket FROM corpus)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM sig a JOIN sig b ON a.bucket = b.bucket
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(a.v, b.v), 6) >= 0.45
ORDER BY id_a, id_b
"""


PIPE_NEARDUP_BUCKETED_SQL = _neardup_bucketed_sql()


# --------------------------------------------------------------------------
# The END-TO-END curation pipeline (examples/curation_pipeline.py) as ONE
# gated chain: quality gates → repetition gate → classifier score → PII
# redaction → benchmark decontamination → exact substring (span) dedup →
# MinHash-LSH dedup clustering (keep canonical) → per-domain cap →
# deterministic sample → context-window chunking → epoch shuffle →
# token-budget packing. Every stage runs in its oracle-replicable mode
# (md5 hashers, string n-grams) so a single DuckDB query re-derives the
# whole composition — this certifies the per-stage operators COMPOSE
# (each stage consumes the previous stage's survivor set and rewritten
# text), which no per-stage gate checks. The chain is one lazy Catalyst
# plan except the connected-components fixpoint (inherently iterative;
# localCheckpoint-truncated, see operators/cluster.py).
def pipe_curation_e2e(spark, sf_dir):
    from .operators.chunking import chunk_documents
    from .operators.cluster import canonical_docs
    from .operators.decontaminate import decontaminate
    from .operators.dedup import lsh_star_edges, minhash_signature
    from .operators.sampling import (
        deterministic_shuffle,
        domain_cap,
        hash_sample,
        token_pack,
    )
    from .operators.scoring import demo_weights, score_linear
    from .operators.substring import strip_duplicate_spans
    from .operators.text import quality_features, redact_pii, repetition_features

    from .operators._util import spread_small_input

    # Spread a few-partition corpus scan first (no-op at production
    # scale): stages 1-5's map work — quality/repetition features, the
    # hashed-BoW score, the PII regex chain, decontamination grams —
    # otherwise all run BEFORE the chain's first corpus exchange, i.e.
    # serially on the scan's single sf0.1 task. Measured (interleaved
    # A/B, 4 paired rounds, outputs bit-identical): best 9.55 -> 3.97 s,
    # median 10.4 -> 7.8 s. Every downstream stage is key-deterministic
    # (domain_cap/token_pack carry explicit id tie-breaks; sampling and
    # shuffle are md5-keyed; CC's min-label fixpoint is order-free), so
    # input partitioning cannot change the output.
    docs = spread_small_input(_t(spark, sf_dir, "documents"))
    # 1-2. quality + repetition gates (map-only; thresholds tuned for the
    # synthetic small-vocab corpus, as in the example)
    gated = (
        repetition_features(quality_features(docs))
        .filter((F.col("n_words") >= 5) & (F.col("punct_ratio") < 0.3))
        .filter(F.col("dup_2gram_frac") < 0.9)
    )
    # 3. hashed-BoW linear quality score (md5 buckets — engine-portable)
    scored = score_linear(gated, "text", demo_weights(64), hasher="md5").filter(
        F.col("score") > 0.2
    )
    # 4. PII redaction (chained regexp projection; downstream stages see
    # the REDACTED text)
    clean = (
        redact_pii(scored, count=False)
        .drop("text")
        .withColumnRenamed("text_redacted", "text")
    )
    # 5. benchmark decontamination: drop docs sharing any 8-word-gram
    # with the eval slice (string grams so the oracle replays them)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    clean = decontaminate(clean, eval_df, n=8, hash_grams=False)
    # 5b. exact substring dedup: strip all-but-first occurrences of any
    # repeated 10-token span corpus-wide (rewrites text)
    clean = strip_duplicate_spans(clean, k=10, hasher="md5")
    # 6. MinHash(md5) → LSH star edges → connected components → canonical
    sig = minhash_signature(clean, "text", num_hashes=32, shingle_k=3, hasher="md5")
    pairs = lsh_star_edges(sig, "doc_id", num_bands=8)
    deduped = canonical_docs(clean, pairs)
    # 7-8. per-domain cap, deterministic 50% sample
    capped = domain_cap(deduped, "source", 20)
    sampled = hash_sample(capped, "doc_id", 0.5)
    # 9. 64-token chunks, 8-token overlap
    chunks = chunk_documents(sampled, "doc_id", "text", chunk_tokens=64, overlap=8)
    chunks = chunks.withColumn(
        "sample_id", F.concat_ws("#", F.col("doc_id"), F.col("chunk_id"))
    )
    # 10-11. epoch shuffle (key kept for the oracle), token packing
    shuffled = deterministic_shuffle(chunks, "sample_id", salt="epoch0", keep_key=True)
    packed = token_pack(
        shuffled.withColumnRenamed("chunk_tokens", "tokens"),
        "tokens",
        2048,
        group_col="source",
        id_col="sample_id",
    )
    return packed.select(
        "sample_id", "source", "tokens", "pack_bin", "shuffle_key"
    ).orderBy("sample_id")


def _curation_e2e_sql() -> str:
    from .operators.scoring import demo_weights
    from .operators.text import _PII_PATTERNS

    warr = ", ".join(repr(w) for w in demo_weights(64))
    redacted = "text"
    for tag, pat in _PII_PATTERNS:
        lit = pat.replace("'", "''")
        redacted = f"regexp_replace({redacted}, '{lit}', '[{tag}]', 'g')"
    return rf"""
WITH RECURSIVE
-- 1-2. quality + repetition gates
gate1 AS (
  SELECT doc_id, text, source, n_chars,
         len(w0) AS n_words,
         round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
               / greatest(length(text), 1), 4) AS punct_ratio,
         CASE WHEN len(w0) > 1
              THEN round(1.0 - len(list_distinct(list_transform(range(1, len(w0)), i -> w0[i] || '_' || w0[i+1])))
                         / (len(w0) - 1), 4) ELSE 0.0 END AS dup_2gram_frac,
         w0
  FROM (SELECT *, list_filter(string_split_regex(lower(text), '\s+'), w -> w != '') AS w0
        FROM documents)
),
gated AS (
  SELECT doc_id, text, source, n_chars, w0 FROM gate1
  WHERE n_words >= 5 AND punct_ratio < 0.3 AND dup_2gram_frac < 0.9
),
-- 3. hashed-BoW linear score (md5 buckets, demo weights)
wts AS (SELECT [{warr}]::DOUBLE[] AS warr),
scored AS (
  SELECT doc_id, text, source, n_chars FROM (
    SELECT g.*,
           1.0 / (1.0 + exp(-(CASE WHEN len(w0) > 0 THEN
             list_sum(list_transform(w0,
               x -> warr[(('0x' || substr(md5(x), 1, 8))::BIGINT % 64) + 1])) / len(w0)
             ELSE 0.0 END))) AS score
    FROM gated g, wts)
  WHERE score > 0.2
),
-- 4. PII redaction
red AS (SELECT doc_id, {redacted} AS text, source, n_chars FROM scored),
-- 5. decontamination on 8-word-grams vs the eval slice (original text)
evalg AS (
  SELECT DISTINCT unnest(list_distinct([array_to_string(nw[i:i+7], ' ') for i in range(1, len(nw) - 6)])) AS g
  FROM (SELECT list_filter(string_split_regex(lower(text), '\s+'), w -> w != '') AS nw
        FROM documents WHERE doc_id % 97 = 0)
  WHERE len(nw) >= 8
),
contaminated AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id,
               unnest(list_distinct([array_to_string(rw[i:i+7], ' ') for i in range(1, len(rw) - 6)])) AS g
        FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w != '') AS rw
              FROM red)
        WHERE len(rw) >= 8) cg
  JOIN evalg USING (g)
),
decon AS (SELECT * FROM red WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
-- 5b. exact substring dedup: strip non-keeper 10-token span coverage
stoks AS (SELECT doc_id, source, n_chars, text,
                 string_split_regex(trim(text), '\s+') AS t
          FROM decon),
spans AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         md5(array_to_string(t[u.i+1:u.i+10], ' ')) AS h
  FROM stoks, UNNEST(range(0, greatest(len(t) - 9, 0))) AS u(i)
  WHERE len(t) >= 10
),
marked AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY h) AS cnt,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM spans
),
covered AS (
  SELECT DISTINCT doc_id, CAST(u.ci AS BIGINT) AS ci
  FROM marked, UNNEST(range(pos, pos + 10)) AS u(ci)
  WHERE cnt > 1 AND rn > 1
),
cov_list AS (SELECT doc_id, list(ci) AS cov FROM covered GROUP BY doc_id),
stripped AS (
  SELECT s.doc_id, s.source, s.n_chars,
         CASE WHEN cl.cov IS NULL THEN s.text
              -- coalesce: DuckDB array_to_string([]) is NULL, Spark
              -- concat_ws over an empty array is '' (fully-covered doc)
              ELSE coalesce(array_to_string(list_transform(
                     list_filter(range(1, len(s.t) + 1), ix -> NOT list_contains(cl.cov, ix - 1)),
                     ix -> s.t[ix]), ' '), '')
         END AS text
  FROM stoks s LEFT JOIN cov_list cl USING (doc_id)
),
-- 6. MinHash(md5, 3-shingles) -> 8-band LSH -> reachability closure
mwords AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS ws
           FROM stripped),
shing AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 3
              THEN [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]
              ELSE [coalesce(array_to_string(ws, ' '), '')] END AS sh
  FROM mwords
),
sig AS (
  SELECT doc_id,
         list_transform(range(0, 32), i ->
           list_min(list_transform(sh,
             s -> ('0x' || substr(md5(s || '#' || i::VARCHAR), 1, 8))::BIGINT))) AS mh
  FROM shing
),
banded AS (
  SELECT doc_id, b.band,
         array_to_string(mh[b.band * 4 + 1 : b.band * 4 + 4], ',') AS key
  FROM sig, (SELECT unnest(range(0, 8)) AS band) b
),
lsh_pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM banded a JOIN banded c
    ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
),
edges AS (SELECT id_a AS s, id_b AS d FROM lsh_pairs
          UNION SELECT id_b, id_a FROM lsh_pairs),
walk AS (
  SELECT s AS n, s AS r FROM edges
  UNION
  SELECT wk.n, e.d FROM walk wk JOIN edges e ON e.s = wk.r
),
canon AS (
  SELECT st.* FROM stripped st
  LEFT JOIN (SELECT n, min(r) AS comp FROM walk GROUP BY n) c ON c.n = st.doc_id
  WHERE coalesce(c.comp, st.doc_id) = st.doc_id
),
-- 7-8. per-domain cap (by original n_chars), deterministic 50% sample
capped AS (
  SELECT * FROM (
    SELECT canon.*,
           row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank_in_domain
    FROM canon) WHERE rank_in_domain <= 20
),
sampled AS (SELECT * FROM capped WHERE substr(md5(doc_id::VARCHAR), 1, 4) < '8000'),
-- 9. 64-token chunks, stride 56
cwords AS (SELECT doc_id, source, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS ws
           FROM sampled),
chlist AS (
  SELECT doc_id, source,
         [array_to_string(ws[s:s+63], ' ') for s in range(1, len(ws) + 1, 56)] AS chunks
  FROM cwords WHERE len(ws) > 0
),
chrows AS (
  SELECT doc_id, source, generate_subscripts(chunks, 1) - 1 AS chunk_id,
         unnest(chunks) AS chunk
  FROM chlist
),
-- 10-11. epoch shuffle key + token packing (cumsum bins per source)
final AS (
  SELECT doc_id::VARCHAR || '#' || chunk_id::VARCHAR AS sample_id,
         source,
         len(string_split(chunk, ' '))::BIGINT AS tokens,
         md5('epoch0' || doc_id::VARCHAR || '#' || chunk_id::VARCHAR) AS shuffle_key
  FROM chrows
)
SELECT sample_id, source, tokens,
       CAST(floor((sum(tokens) OVER (PARTITION BY source ORDER BY sample_id
                                     ROWS UNBOUNDED PRECEDING) - tokens) / 2048.0) AS BIGINT) AS pack_bin,
       shuffle_key
FROM final ORDER BY sample_id
"""


PIPE_CURATION_E2E_SQL = _curation_e2e_sql()

PIPELINE_QUERIES: dict[str, tuple] = {
    "pipe_curation_e2e": (pipe_curation_e2e, PIPE_CURATION_E2E_SQL),
    "pipe_image_roundtrip": (pipe_image_roundtrip, PIPE_IMAGE_ROUNDTRIP_SQL),
    "pipe_pii_redact": (pipe_pii_redact, PIPE_PII_REDACT_SQL),
    "pipe_substring_dup": (pipe_substring_dup, PIPE_SUBSTRING_DUP_SQL),
    "pipe_hll_rollup": (pipe_hll_rollup, PIPE_HLL_ROLLUP_SQL),
    "pipe_zorder_layout": (pipe_zorder_layout, PIPE_ZORDER_SQL),
    "pipe_dedup_incremental": (pipe_dedup_incremental, PIPE_DEDUP_INCREMENTAL_SQL),
    "pipe_perplexity": (pipe_perplexity, PIPE_PERPLEXITY_SQL),
    "pipe_fuzzy_match": (pipe_fuzzy_match, PIPE_FUZZY_MATCH_SQL),
    "pipe_tfidf": (pipe_tfidf, PIPE_TFIDF_SQL),
    "pipe_bm25": (pipe_bm25, PIPE_BM25_SQL),
    "pipe_chunk": (pipe_chunk, PIPE_CHUNK_SQL),
    "pipe_shuffle_order": (pipe_shuffle_order, PIPE_SHUFFLE_ORDER_SQL),
    "pipe_rand_proj": (pipe_rand_proj, PIPE_RAND_PROJ_SQL),
    "pipe_quality_score": (pipe_quality_score, PIPE_QUALITY_SCORE_SQL),
    "pipe_emb_quant": (pipe_emb_quant, PIPE_EMB_QUANT_SQL),
    "pipe_decontaminate": (pipe_decontaminate, PIPE_DECONTAMINATE_SQL),
    "pipe_sample_stratified": (pipe_sample_stratified, PIPE_SAMPLE_STRATIFIED_SQL),
    "pipe_mixture_sample": (pipe_mixture_sample, PIPE_MIXTURE_SAMPLE_SQL),
    "pipe_dedup_exact": (pipe_dedup_exact, PIPE_DEDUP_EXACT_SQL),
    "pipe_jaccard_pairs": (pipe_jaccard_pairs, PIPE_JACCARD_SQL),
    "pipe_minhash_lsh": (pipe_minhash_lsh, PIPE_MINHASH_LSH_SQL),
    "pipe_neardup_lsh_verify": (pipe_neardup_lsh_verify, PIPE_NEARDUP_LSH_VERIFY_SQL),
    "pipe_simhash": (pipe_simhash, PIPE_SIMHASH_SQL),
    "pipe_cosine_topk": (pipe_cosine_topk, PIPE_COSINE_TOPK_SQL),
    "pipe_ann_lsh": (pipe_ann_lsh, PIPE_ANN_LSH_SQL),
    "pipe_ann_ivf": (pipe_ann_ivf, PIPE_ANN_IVF_SQL),
    "pipe_cosine_neardup": (pipe_cosine_neardup, PIPE_COSINE_NEARDUP_SQL),
    "pipe_emb_centroid": (pipe_emb_centroid, PIPE_EMB_CENTROID_SQL),
    "pipe_text_tokens": (pipe_text_tokens, PIPE_TEXT_TOKENS_SQL),
    "pipe_text_quality": (pipe_text_quality, PIPE_TEXT_QUALITY_SQL),
    "pipe_langid": (pipe_langid, PIPE_LANGID_SQL),
    "pipe_fingerprint": (pipe_fingerprint, PIPE_FINGERPRINT_SQL),
    "pipe_dedup_cluster": (pipe_dedup_cluster, PIPE_DEDUP_CLUSTER_SQL),
    "pipe_sample_hash": (pipe_sample_hash, PIPE_SAMPLE_HASH_SQL),
    "pipe_domain_cap": (pipe_domain_cap, PIPE_DOMAIN_CAP_SQL),
    "pipe_token_pack": (pipe_token_pack, PIPE_TOKEN_PACK_SQL),
    "pipe_repetition": (pipe_repetition, PIPE_REPETITION_SQL),
    "pipe_minhash_cluster": (pipe_minhash_cluster, PIPE_MINHASH_CLUSTER_SQL),
    "pipe_semantic_dedup": (pipe_semantic_dedup, PIPE_SEMANTIC_DEDUP_SQL),
    "pipe_simhash_arrow": (pipe_simhash_arrow, PIPE_SIMHASH_FULL_SQL),
    "pipe_topk_arrow": (pipe_topk_arrow, PIPE_COSINE_TOPK_SQL),
    "pipe_ann_ivf_arrow": (pipe_ann_ivf_arrow, PIPE_ANN_IVF_SQL),
    "pipe_semdedup_arrow": (pipe_semdedup_arrow, PIPE_SEMANTIC_DEDUP_SQL),
    "pipe_neardup_arrow": (pipe_neardup_arrow, PIPE_NEARDUP_BUCKETED_SQL),
}
