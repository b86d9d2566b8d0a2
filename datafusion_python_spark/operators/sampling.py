"""Corpus-shaping operators for training-data pipelines: deterministic
sampling, per-domain caps, and token-budget packing.

All are single-pass DataFrame compositions (hash filters and window
functions) — no randomness (reproducible across runs and engines), no
driver state, no Python UDFs.  Reference parity: none of these exist in
apache/datafusion-python; they extend the suite for the data-curation
workloads the engine targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Deterministic ~``rate`` sample: keep rows whose md5(id) hex prefix
    falls below the rate threshold.

    Unlike ``df.sample()`` this is stable across runs, engines, partition
    layouts, and cluster sizes — the property a reproducible training-data
    pipeline needs. Pure map-side filter: no shuffle, pushes nothing to
    the driver, and composes with column pruning.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    if rate == 1.0:  # 0x10000 is 5 hex chars and breaks the prefix compare
        return df
    threshold = format(int(rate * 0x10000), "04x")
    prefix = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    return df.filter(prefix < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps rows whose
    md5(id) hex prefix falls under that stratum's threshold.

    The corpus-mixing step of a training pipeline (e.g. books at 0.9,
    crawl at 0.05). Same hash family as :func:`hash_sample`, so the
    kept set is reproducible across runs/engines/cluster sizes AND
    nested: a stratum sampled at 0.5 is a superset of the same stratum
    at 0.25. Pure map-side filter — no shuffle, no per-group pass;
    unlike ``df.sampleBy`` there is no RNG seed to keep stable across
    partition relayouts.
    """
    for r in rates.values():
        if not 0.0 <= r <= 1.0:
            raise ValueError("every rate must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")

    def thr(rate: float) -> str:
        # 0x10000 at rate=1.0 is 5 hex chars: cap at 'ffff~' sentinel > any prefix
        return "g" if rate >= 1.0 else format(int(rate * 0x10000), "04x")

    threshold = F.lit(thr(default_rate))
    for value, rate in sorted(rates.items()):
        threshold = F.when(F.col(strata_col) == value, F.lit(thr(rate))).otherwise(
            threshold
        )
    prefix = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    return df.filter(prefix < threshold)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "",
    key_col: str = "shuffle_key",
    keep_key: bool = False,
) -> DataFrame:
    """Globally re-order rows by ``md5(salt || id)`` — a reproducible
    corpus shuffle for training-order randomization.

    Training runs need the *same* document order on every re-run (and
    on every engine that prepares the data), which ``df.orderBy(rand())``
    cannot give. Hashing the id with a salt yields a uniform,
    engine-portable permutation; changing the salt gives an independent
    epoch order without touching the data.

    ``orderBy`` on the hash is a range-partitioned total sort — Spark
    samples key quantiles and sorts each range partition independently,
    so there is no single-reducer bottleneck and the output stays sorted
    across files when written. Cost: one pass + one shuffle, the minimum
    for a global permutation.
    """
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    out = df.withColumn(key_col, key).orderBy(key_col)
    return out if keep_key else out.drop(key_col)


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    total: int,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-weighted corpus mixing: draw ~``total`` rows with
    per-domain quotas proportional to ``count(domain) ** alpha``.

    ``alpha`` < 1 up-weights small domains relative to their raw share
    (``alpha=0`` → uniform across domains, ``alpha=1`` → proportional),
    the standard smoothing for multi-source training corpora. Selection
    within a domain is the ``total * weight`` smallest ``md5(salt||id)``
    values, so the kept set is deterministic across runs, engines, and
    partition layouts, and nested in ``total`` (a 1M-row draw contains
    the 500k-row draw).

    Scale: the per-domain count table is tiny (one agg) and is
    broadcast back; the only full-data shuffle is the per-domain
    ranking window. No driver-side collection — the normalization
    constant is a 1-row aggregate crossJoined in. ``alpha=0.5`` uses
    ``sqrt`` (correctly rounded per IEEE 754, unlike ``pow``) so quota
    boundaries are reproducible bit-for-bit across engines.
    """
    if total <= 0:
        raise ValueError("total must be positive")

    def weight(col):
        return F.sqrt(col) if alpha == 0.5 else F.pow(col, F.lit(alpha))

    counts = df.groupBy(domain_col).agg(F.count("*").alias("_dom_cnt"))
    norm = counts.agg(F.sum(weight(F.col("_dom_cnt"))).alias("_norm"))
    quotas = (
        counts.crossJoin(F.broadcast(norm))
        .withColumn(
            "_quota",
            F.floor(
                F.lit(float(total)) * weight(F.col("_dom_cnt")) / F.col("_norm")
                + F.lit(1e-6)
            ).cast("long"),
        )
        .select(domain_col, "_quota")
    )
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(domain_col).orderBy(h.asc(), F.col(id_col))
    ranked = df.withColumn("_mix_rank", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quotas), on=domain_col)
        .filter(F.col("_mix_rank") <= F.col("_quota"))
        .drop("_quota")
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    n: int,
    order_by: list | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``n`` rows per domain, best-first.

    One shuffle keyed on the domain; rank + filter fuse into a single
    window stage. ``order_by`` defaults to descending ``n_chars`` with
    ``id_col`` as the deterministic tie-break — at scale a skewed domain
    (one host with 10^9 pages) is the hazard, and Spark's WindowExec
    handles it with rank-based early pruning under AQE.
    """
    order = order_by or [F.col("n_chars").desc()]
    w = Window.partitionBy(domain_col).orderBy(*order, F.col(id_col))
    return df.withColumn("rank_in_domain", F.row_number().over(w)).filter(
        F.col("rank_in_domain") <= n
    )


def token_pack(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    group_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign docs to fixed-token-budget bins (context-window packing).

    Docs are laid out in ``id_col`` order (within ``group_col`` if
    given); a doc goes into the bin where its start offset lands:
    ``bin = floor((cumsum - tokens) / budget)``.  Bins may overflow by
    at most one doc — the streaming-friendly relaxation of greedy bin
    packing, computable as one window cumsum instead of a sequential
    scan, so it parallelizes per group across the cluster.
    """
    keys = [group_col] if group_col else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return df.withColumn("pack_bin", F.floor(start / F.lit(budget)))
