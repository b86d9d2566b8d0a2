"""XL corpus scale evidence: the flagship curation operators at sizes
far beyond the PIPESCALE replicas, with PLANTED ground truth instead of
a DuckDB oracle (the per-op driver gates already certify value-level
correctness at sf0.01; this artifact certifies behavior-at-size).

The corpus is generated IN SPARK (xxhash64-mixed spark.range — fully
distributed, deterministic, no driver materialization, same scheme as
tools/dbbench.py). Per 10-row cell with base row b:

  rows b..b+7   unique texts: 30-69 tokens drawn from a 30k vocab,
                seeded by the row's own id
  row b+8       EXACT copy of row b's text
  row b+9       NEAR copy: row b's text + one globally unique tail
                token ("t<id>") -> word-shingle Jaccard m/(m+1) with
                m >= 30 distinct words, i.e. >= 0.96 — always over the
                0.8 near-dup threshold

Known truth per cell: 1 exact-dup group of 3 texts sharing a prefix
(b == b+8; b+9 appends one token), 3 true J>=0.8 pairs
{(b,b+8) J=1, (b,b+9), (b+8,b+9)}. Corpus-wide: survivors after exact
dedup = DuckDB's distinct-text count (expected ~9N/10 up to hash-seed
coincidences), planted near-dup pairs = 3N/10. MinHash-LSH recall at
J>=0.96 with 8 bands x 4 rows is 1-(1-J^4)^8 >= 1-3e-8, so planted
recall must measure ~1.0 and every emitted pair is exact-verified by
construction (precision 1.0).

simhash_near_dups is measured at the SMALL size only: its 16-bit
block-LSH admits ~N^2 * 4 / 2^16 random candidate collisions (at 1e7
docs that is ~6.1e9 candidate pairs from block coincidences alone —
quadratic in N), so the honest 1e7+ path for hamming-ball search is
either wider blocks (more bits per block => fewer coincidences but
lower hamming guarantee) or the MinHash-LSH operator above; the
arithmetic is recorded in PIPESCALE_XL.md.

Usage: python tools/pipescale_xl.py [n ...] [--fresh]
       (default sizes: 1250000 10000000 — an 8x ratio for alpha)
Writes PIPESCALE_XL.md and prints one JSON line per size.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_python_spark.session import get_spark

WORK = "/tmp/pipescale_xl"
VOCAB = 30_000


def build(spark, n: int) -> str:
    out = f"{WORK}/n{n}"
    if os.path.exists(f"{out}/_DONE"):
        return out
    shutil.rmtree(out, ignore_errors=True)
    r = spark.range(n).withColumnRenamed("id", "i")
    pos = F.pmod(F.col("i"), F.lit(10))
    seed = F.when(pos >= 8, F.col("i") - pos).otherwise(F.col("i"))
    n_words = (F.pmod(F.xxhash64(seed, F.lit(1)), F.lit(40)) + F.lit(30)).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(seed, j, F.lit(2)), F.lit(VOCAB))
        ),
    )
    text = F.concat_ws(" ", words)
    text = F.when(
        pos == 9, F.concat(text, F.lit(" t"), F.col("i").cast("string"))
    ).otherwise(text)
    r.select(F.col("i").alias("doc_id"), text.alias("text")).write.mode(
        "overwrite"
    ).parquet(f"{out}/documents.parquet")
    open(f"{out}/_DONE", "w").close()
    return out


def _timed(df, warm: bool = True) -> tuple[float, int]:
    # one untimed warm execution first (as dbbench.py does) so the first
    # operator at a size doesn't absorb JVM/codegen/scan-cache warmup —
    # the r9 artifact's exact_dedup alpha of -0.08 (10M measured FASTER
    # than 1.25M) was that warmup landing on the small size's first op
    if warm:
        df.write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    return sec, df.count()


def _duck_distinct(d: str) -> int:
    import duckdb

    con = duckdb.connect()
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    return con.execute(
        "SELECT count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))"
        f" FROM read_parquet('{d}/documents.parquet/*.parquet')"
    ).fetchone()[0]


def run_size(spark, n: int) -> dict:
    from datafusion_python_spark.operators.dedup import (
        exact_dedup,
        near_dup_pairs_lsh,
        simhash,
        simhash_near_dups,
    )
    from datafusion_python_spark.operators.text import (
        bpe_ish_token_count,
        language_id,
        quality_features,
    )

    d = build(spark, n)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    res: dict[str, dict] = {}

    # --- exact dedup: survivors must equal DuckDB's distinct-text count
    sec, rows = _timed(exact_dedup(docs, "text", "doc_id"))
    expect = _duck_distinct(d)
    res["exact_dedup"] = {
        "sec": round(sec, 2),
        "out_rows": rows,
        "verify": f"survivors == duckdb distinct ({expect})",
        "ok": rows == expect,
    }

    # --- minhash-LSH near-dup pairs: planted recall + exact precision
    pairs = near_dup_pairs_lsh(
        docs, "doc_id", "text", threshold=0.8, num_hashes=32, num_bands=8,
        shingle_k=1, hasher="xxhash64",
    )
    sec, rows = _timed(pairs)
    cell = lambda c: (F.col(c) / 10).cast("bigint")  # noqa: E731
    planted = pairs.filter(
        (cell("id_a") == cell("id_b"))
        & F.pmod(F.col("id_a"), F.lit(10)).isin(0, 8, 9)
        & F.pmod(F.col("id_b"), F.lit(10)).isin(0, 8, 9)
    ).count()
    expected = 3 * (n // 10)
    recall = planted / expected
    res["minhash_lsh_pairs"] = {
        "sec": round(sec, 2),
        "out_rows": rows,
        "verify": f"planted recall {planted}/{expected} = {recall:.6f}, "
        f"{rows - planted} extra pairs (all exact-verified J>=0.8)",
        "ok": recall >= 0.995,
    }

    # --- simhash hamming-ball pairs: exact-dup pairs (hamming 0) must
    # all surface; block-LSH candidate volume caps this op at ~1e6 docs
    # (see module docstring), so skip above that and record why.
    if n <= 2_000_000:
        sig = simhash(docs, "text", hasher="xxhash64")
        sh_pairs = simhash_near_dups(sig, "doc_id", max_hamming=8, bits=64)
        sec, rows = _timed(sh_pairs)
        exact_found = sh_pairs.filter(
            (cell("id_a") == cell("id_b"))
            & (F.pmod(F.col("id_a"), F.lit(10)) == 0)
            & (F.pmod(F.col("id_b"), F.lit(10)) == 8)
        ).count()
        res["simhash_pairs"] = {
            "sec": round(sec, 2),
            "out_rows": rows,
            "verify": f"exact-dup pairs (hamming 0) {exact_found}/{n // 10}",
            "ok": exact_found == n // 10,
        }

    # --- map-only text stats: quality + langid + tokens in ONE pass
    stats = language_id(quality_features(docs)).withColumn(
        "n_tokens", bpe_ish_token_count(F.col("text"))
    )
    sec, rows = _timed(stats)
    res["text_stats"] = {
        "sec": round(sec, 2),
        "out_rows": rows,
        "verify": f"rows == corpus ({n})",
        "ok": rows == n,
    }
    return res


DIM = 64


def build_emb(spark, n: int) -> str:
    """N embedding rows, dim 64, uniform[-1,1] entries; per 4-row cell
    with base b, row b+3 is an EXACT copy of row b's vector — so
    SemDeDup survivors are exactly 3N/4 (identical vectors always share
    an argmax cell and have cosine 1.0; at threshold 0.9 a false random
    dup needs a ~7-sigma cosine, expected count ≪ 1 corpus-wide)."""
    out = f"{WORK}/emb{n}"
    if os.path.exists(f"{out}/_DONE"):
        return out
    shutil.rmtree(out, ignore_errors=True)
    r = spark.range(n).withColumnRenamed("id", "i")
    seed = F.when(F.pmod(F.col("i"), F.lit(4)) == 3, F.col("i") - F.lit(3)).otherwise(
        F.col("i")
    )
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (
            (F.pmod(F.xxhash64(seed, j, F.lit(7)), F.lit(2_000_001)) - F.lit(1_000_000))
            / F.lit(1_000_000.0)
        ).cast("float"),
    )
    r.select(F.col("i").alias("vec_id"), vec.alias("embedding")).write.mode(
        "overwrite"
    ).parquet(f"{out}/embeddings.parquet")
    open(f"{out}/_DONE", "w").close()
    return out


def run_emb_size(spark, n: int) -> dict:
    from datafusion_python_spark.operators.semdedup import semantic_dedup
    from datafusion_python_spark.operators.similarity import (
        cosine_topk_arrow,
        ivf_ann,
    )

    d = build_emb(spark, n)
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n_clusters = max(64, int(math.sqrt(n)))
    res: dict[str, dict] = {}

    # --- SemDeDup (fused Arrow path): survivors must be exactly 3N/4
    sec, rows = _timed(
        semantic_dedup(emb, n_clusters=n_clusters, threshold=0.9, arrow=True)
    )
    res["semantic_dedup_arrow"] = {
        "sec": round(sec, 2),
        "out_rows": rows,
        "verify": f"survivors == 3N/4 ({3 * n // 4}), k={n_clusters} clusters",
        "ok": rows == 3 * n // 4,
    }

    # --- brute-force cosine top-k: the planted copy pair must lead
    q = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    q = [float(v) for v in q]
    sec, _ = _timed(cosine_topk_arrow(emb, q, k=10))
    brute = [r["vec_id"] for r in cosine_topk_arrow(emb, q, k=10).collect()]
    res["cosine_topk_arrow"] = {
        "sec": round(sec, 2),
        "out_rows": 10,
        "verify": f"planted copies {{0,3}} in top-10: {sorted(brute[:2])}",
        "ok": {0, 3} <= set(brute),
    }

    # --- IVF ANN (Arrow): probing ~2.5% of cells must still surface the
    # planted pair (the query IS their vector, so their cell ranks first)
    n_probe = max(2, n_clusters // 40)
    sec, _ = _timed(
        ivf_ann(emb, q, n_list=n_clusters, n_probe=n_probe, k=10, arrow=True)
    )
    ivf_ids = [
        r["vec_id"]
        for r in ivf_ann(
            emb, q, n_list=n_clusters, n_probe=n_probe, k=10, arrow=True
        ).collect()
    ]
    recall = len(set(ivf_ids) & set(brute)) / 10
    res["ivf_ann_arrow"] = {
        "sec": round(sec, 2),
        "out_rows": 10,
        "verify": f"planted {{0,3}} found, recall@10 vs brute = {recall:.2f} "
        f"(n_probe {n_probe}/{n_clusters} cells — random-corpus tail recall "
        "is the documented IVF trade)",
        "ok": {0, 3} <= set(ivf_ids),
    }
    return res


def main() -> None:
    sizes = [1_250_000, 10_000_000]
    emb_sizes = [500_000, 4_000_000]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        sizes = [int(a) for a in args]
        emb_sizes = []
    for a in sys.argv[1:]:
        if a.startswith("--emb="):
            emb_sizes = [int(x) for x in a.split("=", 1)[1].split(",") if x]
    if "--fresh" in sys.argv:
        shutil.rmtree(WORK, ignore_errors=True)
    spark = get_spark("pipescale-xl")
    spark.sparkContext.setLogLevel("ERROR")

    per: dict[int, dict] = {}
    for n in sizes:
        per[n] = run_size(spark, n)
        print(json.dumps({"metric": "pipescale_xl", "n_docs": n, "ops": per[n]}), flush=True)
    per_emb: dict[int, dict] = {}
    for n in emb_sizes:
        per_emb[n] = run_emb_size(spark, n)
        print(json.dumps({"metric": "pipescale_xl_emb", "n_vecs": n, "ops": per_emb[n]}), flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lo, hi = min(per), max(per)
    lines = [
        "# PIPESCALE_XL — curation operators at 1.25M and 10M documents, planted ground truth",
        "",
        "Corpus generated in Spark (xxhash64-mixed spark.range, ~300 B/doc "
        "of 30-69 synthetic tokens from a 30k vocab): per 10-row cell, row "
        "b+8 is an EXACT copy of row b and row b+9 a NEAR copy (one unique "
        "tail token, word-Jaccard >= 0.96) — so exact-dup survivors, true "
        "near-dup pairs (3 per cell), and hamming-0 simhash pairs are all "
        "known in closed form and every run is verified against them "
        "(tools/pipescale_xl.py; single timed run, noop sink, local[32]). "
        "This extends PIPESCALE's 320k-doc replica curves by ~30x with "
        "truth-checked outputs instead of unverified timings.",
        "",
    ]
    for n in sorted(per):
        lines += [
            f"## {n:,} documents",
            "",
            "| op | sec | docs/s | out rows | verification | ok |",
            "|---|---|---|---|---|---|",
        ]
        for op, r in per[n].items():
            lines.append(
                f"| {op} | {r['sec']} | {int(n / r['sec']):,} | "
                f"{r['out_rows']:,} | {r['verify']} | "
                f"{'PASS' if r['ok'] else '**FAIL**'} |"
            )
        lines.append("")
    if lo != hi:
        ratio = hi / lo
        lines += [
            f"## Scaling {lo:,} → {hi:,} docs (alpha = log-time-ratio / "
            f"log-{ratio:g}x; 1.0 = linear)",
            "",
            "| op | alpha |",
            "|---|---|",
        ]
        for op, r_lo in per[lo].items():
            r_hi = per[hi].get(op)
            if r_hi:
                a = math.log(r_hi["sec"] / r_lo["sec"]) / math.log(ratio)
                lines.append(f"| {op} | {a:.2f} |")
        lines.append("")
    for n in sorted(per_emb):
        lines += [
            f"## {n:,} embedding vectors (dim {DIM}, planted exact-copy per 4-row cell)",
            "",
            "| op | sec | vecs/s | out rows | verification | ok |",
            "|---|---|---|---|---|---|",
        ]
        for op, r in per_emb[n].items():
            lines.append(
                f"| {op} | {r['sec']} | {int(n / r['sec']):,} | "
                f"{r['out_rows']:,} | {r['verify']} | "
                f"{'PASS' if r['ok'] else '**FAIL**'} |"
            )
        lines.append("")
    if len(per_emb) >= 2:
        ns_e = sorted(per_emb)
        lo_e, hi_e = ns_e[0], ns_e[-1]
        ratio_e = hi_e / lo_e
        lines += [
            f"## Embedding scaling {lo_e:,} → {hi_e:,} vecs (alpha over {ratio_e:g}×)",
            "",
            "| op | alpha |",
            "|---|---|",
        ]
        for op, r_lo in per_emb[lo_e].items():
            r_hi = per_emb[hi_e].get(op)
            if r_hi:
                a = math.log(r_hi["sec"] / r_lo["sec"]) / math.log(ratio_e)
                lines.append(f"| {op} | {a:.2f} |")
        lines += [
            "",
            "SemDeDup's k grows with sqrt(N), so per-cell pair work is "
            "~N/k × N/k × k = N²/k = N·sqrt(N) per corpus — the "
            "theoretical alpha is 1.5 (the SemDeDup paper's trade), and "
            "a measured alpha near 1.0 means the quadratic tile term has "
            "not yet overtaken the linear scan/assignment/exchange floor "
            "at these sizes (round 10's collision-proof kernel placement "
            "and single-threaded worker BLAS removed the scheduling "
            "artifacts that previously inflated it); at fixed k the op "
            "is linear in N and at 100 TB k tracks corpus size the same "
            "way. IVF probe cost is n_probe/n_list of the corpus per "
            "query regardless of N.",
            "",
        ]
    lines += [
        "simhash_pairs stops at the small size by design: "
        "simhash_near_dups blocks the 64-bit signature into 4 x 16-bit "
        "keys, and RANDOM block coincidences alone contribute "
        "~N^2 * 4 / 2^16 candidate pairs — ~6.1e9 at 1e7 docs, quadratic "
        "in N. That is the honest ceiling of narrow-block hamming LSH, "
        "not an implementation defect; past ~1e6 docs the scale path for "
        "near-dup detection is minhash-LSH above (pair work tracks the "
        "true duplicate structure, never corpus^2) or wider simhash "
        "blocks traded against the hamming guarantee.",
        "",
    ]
    with open(os.path.join(root, "PIPESCALE_XL.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("wrote PIPESCALE_XL.md")


if __name__ == "__main__":
    main()
