"""Corpus-operator scale smoke: replicate documents/events/embeddings
~Nx (default 20×: 100k docs / 2M events / 40k vectors) and time the
corpus-pipeline operators at 1× and N×, verifying runtime grows roughly
linearly (shuffle-free ops must not super-scale) and plans keep their
shape at a size 20× beyond the bench SF.

Usage: python tools/corpus_scalesmoke.py [factor]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_python_spark.session import get_spark
from datafusion_python_spark.tables import load_table


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    base = "/root/testdata/sf0.1"
    out = "/tmp/corpus_scalesmoke"
    spark = get_spark("corpus-scalesmoke")

    if not os.path.isdir(f"{out}/documents.parquet"):
        shutil.rmtree(out, ignore_errors=True)
        reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
        for t, key in (
            ("documents", "doc_id"),
            ("events", "event_id"),
            ("embeddings", "vec_id"),
        ):
            df = load_table(spark, base, t)
            stride = df.agg(F.max(key)).first()[0] + 1
            big = (
                df.select("*", reps)
                .withColumn(key, F.col(key) + F.col("rep") * F.lit(stride))
                .drop("rep")
            )
            big.write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    def tables(sf_dir):
        return (
            load_table(spark, sf_dir, "documents"),
            load_table(spark, sf_dir, "events"),
            load_table(spark, sf_dir, "embeddings"),
        )

    from datafusion_python_spark.operators.chunking import chunk_documents
    from datafusion_python_spark.operators.layout import zorder_layout
    from datafusion_python_spark.operators.projection import random_projection
    from datafusion_python_spark.operators.ranking import bm25, tf_idf
    from datafusion_python_spark.operators.sampling import deterministic_shuffle
    from datafusion_python_spark.operators.scoring import demo_weights, score_linear
    from datafusion_python_spark.operators.sketches import distinct_rollup
    from datafusion_python_spark.operators.substring import duplicate_regions

    def ops(sf_dir):
        docs, ev, emb = tables(sf_dir)
        day = F.date_format("ts", "yyyy-MM-dd").alias("day")
        return {
            "substr_dup": lambda: duplicate_regions(docs, k=10),
            "chunk": lambda: chunk_documents(docs, "doc_id", "text", 64, 8),
            "tfidf_top2": lambda: tf_idf(docs, "doc_id", "text", top_terms=2),
            "bm25": lambda: bm25(docs, "doc_id", "text", ["spark", "vector", "query"]),
            "shuffle": lambda: deterministic_shuffle(docs, "doc_id", "e0"),
            "score": lambda: score_linear(docs, "text", demo_weights(256)),
            "hll_rollup": lambda: distinct_rollup(
                ev.select(day, "user_id"), ["day"], [], "user_id"
            ),
            "rand_proj": lambda: random_projection(emb, "embedding", out_dim=16),
            "zorder": lambda: zorder_layout(
                ev.select("event_id", "user_id", "value"),
                ["user_id", "event_id"],
                bits=8,
            ),
        }

    # warm both directories once (JIT/codegen/footers), then time
    for sf_dir in (base, out):
        for fn in ops(sf_dir).values():
            _noop(fn())
    print(f"{'op':<12} {'1x sec':>8} {f'{factor}x sec':>9} {'ratio':>7}  (linear == {factor}.0)")
    for name in ops(base):
        t1 = _noop(ops(base)[name]())
        tn = _noop(ops(out)[name]())
        print(f"{name:<12} {t1:>8.2f} {tn:>9.2f} {tn / t1:>7.1f}")


if __name__ == "__main__":
    main()
