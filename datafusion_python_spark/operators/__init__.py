"""Beyond-parity operators for large-scale training-data pipelines.

Everything here is built from Spark built-ins (higher-order functions,
hash functions, window/group ops) so it stays inside whole-stage codegen
and scales horizontally — no Python in the hot path. The multimodal
module is the one exception (Pandas-UDF plumbing with stubbed decoders).
"""

from .dedup import (
    exact_dedup,
    incremental_dedup,
    minhash_signature,
    lsh_candidate_pairs,
    near_dup_pairs_lsh,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
    minhash_signature_arrow,
    simhash,
    simhash_arrow,
    simhash_near_dups,
)
from .similarity import (
    cosine_near_dup_pairs_arrow,
    cosine_similarity_col,
    cosine_topk,
    cosine_topk_arrow,
    ivf_assign_arrow,
    lsh_bucket_ann,
)
from .text import (
    doc_fingerprint,
    language_id,
    quality_features,
    token_count,
)
from .chunking import chunk_documents
from .decontaminate import contamination_report, decontaminate
from .funnel import funnel, funnel_summary, retention_cohorts
from .fuzzy import fuzzy_join, fuzzy_self_pairs, qgrams
from .skew import salted_agg, salted_join
from .layout import bucketize, zorder_layout, zvalue
from .lm import perplexity, train_bigram_counts
from .projection import projection_signs, random_projection, random_projection_arrow
from .quantize import dequantize, quantize_embeddings, reconstruction_rmse
from .ranking import bm25, doc_frequencies, doc_terms, tf_idf
from .sampling import (
    deterministic_shuffle,
    domain_cap,
    hash_sample,
    stratified_sample,
    token_pack,
)
from .gapfill import bucket_aggregate, gapfill
from .graph import pagerank, transition_edges
from .scoring import quality_filter, score_linear
from .sketches import distinct_rollup, hll_estimate, hll_merge, hll_partial
from .substring import (
    duplicate_regions,
    duplicate_spans,
    span_index,
    strip_duplicate_spans,
)
from .temporal import asof_join, range_join

__all__ = [
    "bucket_aggregate",
    "gapfill",
    "pagerank",
    "transition_edges",
    "duplicate_regions",
    "duplicate_spans",
    "span_index",
    "strip_duplicate_spans",
    "bm25",
    "bucketize",
    "chunk_documents",
    "funnel",
    "funnel_summary",
    "fuzzy_join",
    "fuzzy_self_pairs",
    "qgrams",
    "retention_cohorts",
    "salted_agg",
    "salted_join",
    "perplexity",
    "train_bigram_counts",
    "zorder_layout",
    "zvalue",
    "deterministic_shuffle",
    "distinct_rollup",
    "doc_frequencies",
    "doc_terms",
    "hll_estimate",
    "hll_merge",
    "hll_partial",
    "projection_signs",
    "random_projection",
    "random_projection_arrow",
    "tf_idf",
    "contamination_report",
    "decontaminate",
    "dequantize",
    "quantize_embeddings",
    "reconstruction_rmse",
    "domain_cap",
    "hash_sample",
    "stratified_sample",
    "token_pack",
    "quality_filter",
    "score_linear",
    "asof_join",
    "range_join",
    "exact_dedup",
    "incremental_dedup",
    "minhash_signature",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_prefix",
    "near_dup_pairs_lsh",
    "minhash_signature_arrow",
    "simhash",
    "simhash_arrow",
    "simhash_near_dups",
    "cosine_near_dup_pairs_arrow",
    "cosine_similarity_col",
    "cosine_topk",
    "cosine_topk_arrow",
    "ivf_assign_arrow",
    "lsh_bucket_ann",
    "doc_fingerprint",
    "language_id",
    "quality_features",
    "token_count",
]
