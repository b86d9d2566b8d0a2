"""Document chunking: split long documents into overlapping token
windows — the context-length preprocessing step every LLM training
pipeline runs between curation and tokenization.

Map-only: word offsets, window starts, and chunk texts are all array
math on staged columns (``sequence`` → ``transform`` → ``slice`` →
``array_join``), then one ``posexplode``. No shuffle, no UDF — a 100 TB
corpus chunks at scan speed, and the explode multiplies rows *after*
filters have pruned, so it composes with pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _words


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 256,
    overlap: int = 0,
    out_text_col: str = "chunk_text",
) -> DataFrame:
    """One output row per (document, chunk).

    Chunks are windows of ``chunk_tokens`` whitespace tokens starting at
    1, 1+stride, 1+2·stride, … with ``stride = chunk_tokens − overlap``;
    the final window may be shorter. Empty documents produce no rows.

    Output: all input columns except ``text_col``, plus ``chunk_id``
    (0-based), ``out_text_col`` (tokens re-joined with single spaces —
    chunk boundaries are token-aligned, so downstream tokenization sees
    identical words), and ``chunk_tokens`` (the window's actual length).
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # stage the token array once (HOFs are interpreted — an inlined split
    # would re-run per chunk), then build all chunk strings per row
    staged = df.withColumn("__ck_words", _words(F.col(text_col)))
    words = F.col("__ck_words")
    n = F.size(words)
    starts = F.when(
        n > 0, F.sequence(F.lit(1), n, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.array_join(F.slice(words, s, chunk_tokens), " "),
    )
    staged = staged.withColumn("__ck_chunks", chunks)
    keep = [c for c in df.columns if c != text_col]
    return (
        staged.select(
            *keep,
            F.posexplode(F.col("__ck_chunks")).alias("chunk_id", out_text_col),
        )
        .withColumn(
            "chunk_tokens",
            F.size(F.split(F.col(out_text_col), " ")).cast("long"),
        )
    )
