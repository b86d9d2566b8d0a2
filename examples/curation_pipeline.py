"""End-to-end training-data curation pipeline over the documents table:

  quality gates  →  repetition gates  →  classifier quality score  →
  PII redaction  →  benchmark decontamination  →
  exact substring (span) dedup  →
  MinHash-LSH dedup clustering (keep canonical)  →
  per-domain cap  →  deterministic 50% sample  →
  context-window chunking  →  deterministic epoch shuffle  →
  token-budget packing

Every stage is a pure DataFrame transformation — the whole pipeline is
ONE Catalyst plan (lazily composed, map-side where possible, shuffles
only on dedup-bucket / domain / pack keys), so at 100 TB it executes as
a handful of stages instead of seven materialized passes.

Run: python examples/curation_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_python_spark.operators.chunking import chunk_documents
from datafusion_python_spark.operators.cluster import canonical_docs
from datafusion_python_spark.operators.decontaminate import decontaminate
from datafusion_python_spark.operators.dedup import lsh_star_edges, minhash_signature
from datafusion_python_spark.operators.sampling import (
    deterministic_shuffle,
    domain_cap,
    hash_sample,
    token_pack,
)
from datafusion_python_spark.operators.scoring import demo_weights, score_linear
from datafusion_python_spark.operators.text import (
    quality_features,
    redact_pii,
    repetition_features,
    token_count,
)
from datafusion_python_spark.session import get_spark
from datafusion_python_spark.tables import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark("curation-pipeline")

docs = load_table(spark, sf_dir, "documents")
n0 = docs.count()

# 1-2. quality + repetition gates (map-only projections and filters)
# thresholds here are tuned DOWN for the synthetic small-vocab corpus
# (its dup_word_frac is naturally ~0.9); production values would be the
# Gopher/C4 ones (e.g. dup_word_frac < 0.3).
gated = (
    repetition_features(quality_features(docs))
    .filter((F.col("n_words") >= 5) & (F.col("punct_ratio") < 0.3))
    .filter(F.col("dup_2gram_frac") < 0.9)
)

# 3. classifier quality score (hashed-BoW linear model, map-only; a real
# deployment plugs trained fastText-style weights in here). Permissive
# threshold: demo weights are noise, this demonstrates the plumbing.
scored = score_linear(gated, "text", demo_weights(256)).filter(F.col("score") > 0.2)

# 4. PII redaction (map-only regexp projection)
clean = redact_pii(scored, count=False).drop("text").withColumnRenamed(
    "text_redacted", "text"
)

# 5. benchmark decontamination: drop docs colliding with the held-out
# eval slice on any 8-word-gram (broadcast anti-join, corpus stays
# map-side). Eval stand-in: every 97th doc.
eval_df = docs.filter(F.col("doc_id") % 97 == 0)
clean = decontaminate(clean, eval_df, n=8)

# 5b. exact substring dedup: strip all-but-first occurrences of any
# repeated 10-token span corpus-wide (Lee et al. 2022 — catches copied
# boilerplate inside otherwise-unique docs that doc-level dedup misses)
from datafusion_python_spark.operators.substring import strip_duplicate_spans

clean = strip_duplicate_spans(clean, k=10)

# 6. MinHash → LSH → connected components → canonical doc per cluster.
# 3-word shingles: near-dup means shared PHRASES. (Unigram shingles on
# this synthetic corpus — one 30-word vocab — would mark everything a
# near-dup of everything and keep a single canonical doc.)
sig = minhash_signature(clean, "text", num_hashes=32, shingle_k=3)
# star edges (bucket-min -> member): same connected components as the
# all-pairs bucket clique, LINEAR per bucket instead of quadratic — the
# form that survives a bucket with 10^5 near-copies at 100 TB
pairs = lsh_star_edges(sig, "doc_id", num_bands=8)
deduped = canonical_docs(clean, pairs)

# 7-8. per-domain cap, deterministic sample
capped = domain_cap(deduped, "source", 20)
sampled = hash_sample(capped, "doc_id", 0.5)

# 9. context-window chunking: 64-token windows, 8-token overlap
# (map-only; each chunk becomes its own training sample)
chunks = chunk_documents(sampled, "doc_id", "text", chunk_tokens=64, overlap=8)
chunks = chunks.withColumn(
    "sample_id", F.concat_ws("#", F.col("doc_id"), F.col("chunk_id"))
)

# 10. deterministic epoch shuffle: reproducible global training order;
# changing the salt re-deals the order for the next epoch
shuffled = deterministic_shuffle(chunks, "sample_id", salt="epoch0")

# 11. token-budget packing into 2048-token bins per source
packed = token_pack(
    shuffled.withColumnRenamed("chunk_tokens", "tokens"),
    "tokens",
    2048,
    group_col="source",
    id_col="sample_id",
)

summary = packed.groupBy("source").agg(
    F.count("*").alias("samples"),
    F.sum("tokens").alias("tokens"),
    (F.max("pack_bin") + 1).alias("bins"),
)
summary.show(5, truncate=False)
n1 = packed.count()
print(f"{n0} docs in -> {n1} curated training samples out")
packed.select("sample_id", "source", "tokens", "pack_bin").explain("simple")
