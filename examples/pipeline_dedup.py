"""Training-data dedup pipeline example: MinHash-LSH candidates verified
by exact Jaccard, over the documents table.

Run: python examples/pipeline_dedup.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from datafusion_python_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
)
from datafusion_python_spark.session import get_spark
from datafusion_python_spark.tables import load_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("dedup-example")
docs = load_table(spark, sf_dir, "documents")

sig = minhash_signature(docs, "text", num_hashes=32, shingle_k=1)
candidates = lsh_candidate_pairs(sig, "doc_id", num_bands=8)
exact = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.95)

n_cand = candidates.count()
verified = candidates.join(exact, ["id_a", "id_b"], "inner").count()
print(f"candidates={n_cand} verified_jaccard>=0.95={verified}")
exact.orderBy(F.desc("jaccard")).show(5)
