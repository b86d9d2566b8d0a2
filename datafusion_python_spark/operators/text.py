"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All pure column expressions (split / regexp / higher-order functions) —
they compose into any scan without shuffles and stay in codegen, which
is what makes them viable as per-document features over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_SPLIT = r"\s+"

# tiny per-language stopword lists for the n-gram/stopword-overlap
# heuristic; real pipelines would ship fastText — the *shape* (score per
# language, argmax via greatest-struct) is the part that matters here.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "en", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "ist"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "中"],
}


def _words(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), _WORD_SPLIT), lambda w: w != "")


def token_count(col: Column) -> Column:
    """Whitespace token count (bigint)."""
    return F.size(_words(col)).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: words + punctuation runs + digit runs.

    A cheap proxy for BPE token counts (regexp-based, no vocab): counts
    maximal runs of letters, digits, or single punctuation marks.
    """
    return F.size(
        F.filter(
            F.split(F.regexp_replace(F.lower(col), r"([^\p{L}\p{N}\s])", r" $1 "), r"\s+"),
            lambda w: w != "",
        )
    ).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-score features: lengths, ratios, stopword density.

    The standard pre-training quality gates (length bands, symbol ratio,
    stopword floor) express directly over these columns.
    """
    c = F.col(text_col)
    # stage the word array once: HOFs evaluate interpreted with no
    # common-subexpression elimination, so an inlined split would re-run
    # per reference (n_words / stopword filter / length fold)
    staged = df.withColumn("__qf_words", _words(c))
    words = F.col("__qf_words")
    n_words = F.size(words)
    n_chars = F.length(c)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(en_stop, w)))
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\p{L}\p{N}\s]", ""))
    avg_wlen = F.when(n_words > 0, (F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / n_words)).otherwise(0.0)
    return (
        staged.withColumn("n_words", n_words.cast("long"))
        .withColumn("n_chars_m", n_chars.cast("long"))
        .withColumn("punct_ratio", F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4))
        .withColumn("stopword_ratio", F.round(n_stop / F.greatest(n_words, F.lit(1)), 4))
        .withColumn("avg_word_len", F.round(avg_wlen, 4))
        .drop("__qf_words")
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax of stopword-overlap scores.

    Builds one score column per language (fraction of tokens found in
    that language's stopword list) and picks the max via a sorted-struct
    trick — ties break lexicographically, fully deterministic.
    """
    # staged words: one split per row, not one per language filter
    staged = df.withColumn("__li_words", _words(F.col(text_col)))
    words = F.col("__li_words")
    n = F.greatest(F.size(words), F.lit(1))
    scored = []
    for lang, stops in sorted(STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in stops])
        score = F.size(F.filter(words, lambda w: F.array_contains(arr, w))) / n
        scored.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.reverse(F.array_sort(F.array(*scored)))[0]
    return (
        staged.withColumn(out_col, best["lang"])
        .withColumn(f"{out_col}_score", F.round(best["score"], 4))
        .drop("__li_words")
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals: duplicate word / bigram fractions.

    ``dup_word_frac``  = 1 − |distinct words| / |words|
    ``dup_2gram_frac`` = 1 − |distinct bigrams| / |bigrams|

    High values flag boilerplate / keyword-stuffed / looping documents —
    a standard pre-training quality gate (Gopher §A1.1, C4). Pure
    JVM-side array math per row (split → slice/zip_with → array_distinct);
    no shuffle, no UDF, scales as a map-only stage.
    """
    # stage words, then bigrams, so each array is built once per row
    # (HOFs are interpreted — inlined subexpressions re-run per reference)
    staged = df.withColumn("__rf_words", _words(F.col(text_col)))
    words = F.col("__rf_words")
    n_w = F.size(words)
    dup_w = F.when(
        n_w > 0, 1.0 - F.size(F.array_distinct(words)) / n_w
    ).otherwise(0.0)
    # bigrams: zip each word with its successor (length max(n-1, 0))
    m = F.greatest(n_w - 1, F.lit(0))
    staged = staged.withColumn(
        "__rf_bigrams",
        F.zip_with(
            F.slice(words, 1, m),
            F.slice(words, 2, m),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ),
    )
    bigrams = F.col("__rf_bigrams")
    n_b = F.size(bigrams)
    dup_b = F.when(
        n_b > 0, 1.0 - F.size(F.array_distinct(bigrams)) / n_b
    ).otherwise(0.0)
    return (
        staged.withColumn("dup_word_frac", F.round(dup_w, 4))
        .withColumn("dup_2gram_frac", F.round(dup_b, 4))
        .drop("__rf_words", "__rf_bigrams")
    )


_PII_PATTERNS = [
    # (tag, java-regex) — deliberately conservative patterns; RE2/Java-compatible
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    # country code optional — plain 555-867-0042 must match; RE2 has no
    # lookbehind, so no leading boundary (kept DuckDB-oracle-compatible)
    ("PHONE", r"(?:\+?\d{1,2}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def redact_pii(df: DataFrame, text_col: str = "text", count: bool = True) -> DataFrame:
    """Redact common PII shapes (emails, phone numbers, SSNs, IPs) with
    ``[TAG]`` placeholders; optionally append per-tag match counts.

    Chained ``regexp_replace`` — one codegen'd projection, map-only, no
    shuffle; at 100 TB this runs at scan speed. Patterns are a
    conservative regex baseline (a production pipeline would follow with
    an NER pass — that is a model inference step, out of engine scope).
    """
    out = F.col(text_col)
    for tag, pat in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{tag}]")
    res = df.withColumn(f"{text_col}_redacted", out)
    if count:
        for tag, pat in _PII_PATTERNS:
            res = res.withColumn(
                f"n_{tag.lower()}",
                F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).cast("long"),
            )
    return res


def doc_fingerprint(col: Column, length: int = 16) -> Column:
    """Deterministic content fingerprint of normalized text (hex).

    md5 over lowercased, whitespace-collapsed text — the exact-dedup key;
    prefix length trades collision resistance for storage.
    """
    return F.substring(F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))), 1, length)
