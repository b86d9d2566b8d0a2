"""Scale smoke: replicate lineitem/orders ~20× (≈12M lineitem rows,
sf≈2) into /tmp and run the heaviest query shapes, verifying runtime
scales roughly linearly and plans keep their shape (broadcast dims,
pushdown) at a data size 20× beyond the bench SF.

Usage: python tools/scalesmoke.py [factor]
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


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    base = "/root/testdata/sf0.1"
    out = "/tmp/scalesmoke"
    spark = get_spark("scalesmoke")

    if not os.path.isdir(f"{out}/lineitem.parquet"):
        shutil.rmtree(out, ignore_errors=True)
        reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
        # stride must exceed the max base key or replicated keys collide and
        # silently corrupt FK joins (safe at any SF, not just sf0.1)
        stride = (
            load_table(spark, base, "orders").agg(F.max("o_orderkey")).first()[0] + 1
        )
        for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
            df = load_table(spark, base, t)
            big = df.select("*", reps).withColumn(
                key, F.col(key) + F.col("rep") * F.lit(stride)
            ).drop("rep")
            big.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        for t in ("customer", "supplier", "nation", "region", "part"):
            shutil.copytree(f"{base}/{t}.parquet", f"{out}/{t}.parquet") if os.path.isdir(
                f"{base}/{t}.parquet"
            ) else shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")

    li = spark.read.parquet(f"{out}/lineitem.parquet")
    orders = spark.read.parquet(f"{out}/orders.parquet")
    part = spark.read.parquet(f"{out}/part.parquet")
    n = li.count()
    print(f"rows: lineitem={n:,}")

    def timed(label, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.perf_counter() - t0:.2f}s")

    # q1 shape
    timed(
        "q1-shape",
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            F.avg("l_discount"),
            F.count("*"),
        ),
    )
    # fact-fact join + dim broadcast (q9 shape)
    timed(
        "q9-shape",
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("o_orderdate"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))),
    )
    # high-cardinality distinct
    timed("distinct-shape", li.select("l_orderkey").distinct().groupBy().count())

    # ---- corpus operators at 20× documents (~100k docs) --------------------
    # replicate documents with unique ids; each base doc becomes `factor`
    # EXACT copies, so the dedup path must find ~n_base clusters.
    docs_out = f"{out}/documents.parquet"
    if not os.path.exists(docs_out):
        docs = load_table(spark, base, "documents")
        doc_stride = docs.agg(F.max("doc_id")).first()[0] + 1
        reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
        docs.select("*", reps).withColumn(
            "doc_id", F.col("doc_id") + F.col("rep") * F.lit(doc_stride)
        ).drop("rep").write.mode("overwrite").parquet(docs_out)

    big_docs = spark.read.parquet(docs_out)
    n_docs = big_docs.count()
    print(f"rows: documents={n_docs:,}")

    from datafusion_python_spark.operators.cluster import dedup_clusters
    from datafusion_python_spark.operators.dedup import (
        lsh_star_edges,
        minhash_signature,
    )
    from datafusion_python_spark.operators.sampling import (
        domain_cap,
        hash_sample,
        token_pack,
    )
    from datafusion_python_spark.operators.text import repetition_features, token_count

    timed(
        "quality+repetition",
        repetition_features(big_docs).select(
            "doc_id", "dup_word_frac", "dup_2gram_frac"
        ),
    )
    timed("hash-sample", hash_sample(big_docs, "doc_id", 0.1))
    timed("domain-cap", domain_cap(big_docs, "source", 50))
    timed(
        "token-pack",
        token_pack(
            big_docs.withColumn("tokens", token_count(F.col("text"))),
            "tokens",
            2048,
            group_col="source",
        ),
    )
    # full scale-path dedup: signatures → LSH → connected components.
    # 3-word shingles so near-dup = shared phrases; the replicated corpus
    # holds `factor` exact copies of each base doc, so expect ≈ n_base
    # clusters out.
    t0 = time.perf_counter()
    sig = minhash_signature(big_docs, "text", num_hashes=32, shingle_k=3)
    pairs = lsh_star_edges(sig, "doc_id", num_bands=8)
    clustered = dedup_clusters(big_docs, pairs)
    n_clusters = clustered.select("cluster_id").distinct().count()
    print(
        f"minhash-cluster: {time.perf_counter() - t0:.2f}s "
        f"({n_docs:,} docs -> {n_clusters:,} clusters)"
    )


if __name__ == "__main__":
    main()
