"""Deterministic sampling for training-data pipelines.

A 100 TB corpus pass needs samples that are (a) reproducible across
runs and engines, (b) computable in one scan with no shuffle, and
(c) stable under repartitioning — which rules out `df.sample()` (RNG
seeded per-partition → changes with layout). The standard fix is
HASH-GATED sampling: keep a row iff a cryptographic hash of its key
falls under a threshold. md5 is used (not xxhash64) so external
engines can replicate the sample bit-for-bit — the same trick as the
portable MinHash in operators/dedup.py.

All three operators are pure narrow transformations (filter /
TakeOrdered) — no shuffle, no UDF, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DENOM = 1 << 32


def _hash_unit(key_col, salt: str):
    """Deterministic uniform [0,1) from md5(salt:key): first 8 hex
    chars → 32-bit int / 2^32. Portable to any engine with md5."""
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
        float(_DENOM)
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "s"
) -> DataFrame:
    """Keep rows whose hash-unit < fraction. Reproducible across runs,
    engines, and partitionings; disjoint salts give independent
    samples; the same salt at a larger fraction is a SUPERSET (nested
    samples — grow a training set without resampling)."""
    return df.where(_hash_unit(key_col, salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "s",
) -> DataFrame:
    """Per-stratum hash-gated sampling (e.g. downsample web text, keep
    all code). `fractions` maps stratum value → keep fraction; strata
    not listed use default_fraction. The per-stratum threshold joins in
    as a broadcast map literal — still a single narrow scan."""
    thr = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(float(frac))
        ).otherwise(thr)
    return df.where(_hash_unit(key_col, salt) < thr)


def domain_cap(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    max_per_domain: int,
    salt: str = "cap",
    n_buckets: int = 32,
) -> DataFrame:
    """Keep at most max_per_domain rows per domain — the anti-monoculture
    cap of web-corpus pipelines (no single site dominates the mixture).
    Selection is the max_per_domain smallest key hashes WITHIN each
    domain: deterministic, layout-independent, and a superset-stable
    choice as the cap grows.

    TWO-PHASE against hot domains: phase 1 ranks within (domain,
    key-hash bucket) — a salted window whose partitions are bounded to
    ~|domain|/n_buckets rows — and keeps each bucket's cap's worth of
    smallest hashes; phase 2 ranks the survivors (≤ n_buckets × cap
    rows per domain, bounded regardless of skew) within the domain.
    Every global winner is a winner of its own bucket, so the result is
    identical to the single-window form — a pathological single-domain
    corpus no longer funnels through one window partition. n_buckets=1
    degenerates to the single-phase plan (one shuffle) for known-
    balanced domain keys."""
    from pyspark.sql import Window

    h = _hash_unit(key_col, salt)
    out_cols = df.columns
    staged = df.withColumn("_h", h)
    if n_buckets > 1:
        staged = staged.withColumn(
            "_bkt", F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
        )
        w1 = Window.partitionBy(domain_col, "_bkt").orderBy(
            F.col("_h").asc(), F.col(key_col).asc()
        )
        staged = (
            staged.withColumn("_rk", F.row_number().over(w1))
            .where(F.col("_rk") <= max_per_domain)
            .drop("_bkt", "_rk")
        )
    w2 = Window.partitionBy(domain_col).orderBy(
        F.col("_h").asc(), F.col(key_col).asc()
    )
    return (
        staged.withColumn("_rk", F.row_number().over(w2))
        .where(F.col("_rk") <= max_per_domain)
        .select(*out_cols)
    )


def hash_top_n(df: DataFrame, key_col: str, n: int, salt: str = "s") -> DataFrame:
    """Exactly-n deterministic sample: the n rows with the smallest
    key hashes. Plans as TakeOrderedAndProject (parallel partial
    top-n, no full sort). Unlike fraction gating, the size is exact;
    like it, the result is layout- and engine-independent."""
    return df.orderBy(
        _hash_unit(key_col, salt).asc(), F.col(key_col).asc()
    ).limit(n)
