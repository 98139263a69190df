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


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, float]],
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets a named
    split from an ordered (name, fraction) list partitioning [0, 1)
    by its key's hash unit (last split takes the remainder, so the
    fractions need not sum to exactly 1.0 under float error).

    Properties that matter for a 100 TB corpus and that `df.sample`/
    `randomSplit` cannot give: (a) the assignment is a pure row-local
    projection — no shuffle, no RNG state, survives repartitioning and
    re-runs bit-for-bit; (b) it is stable under corpus growth — a
    document keeps its split forever because only its own key hashes,
    which is what keeps eval sets uncontaminated across dataset
    versions; (c) any engine with md5 reproduces it (the DuckDB oracle
    runs the same CASE ladder). Disjoint salts give independent
    re-splits.
    """
    assert splits and abs(sum(f for _, f in splits) - 1.0) < 1e-9, (
        "splits must be (name, fraction) pairs summing to 1.0"
    )
    h = _hash_unit(key_col, salt)
    expr = F.lit(splits[-1][0])  # remainder bucket
    cum = 0.0
    conds = []
    for name, frac in splits[:-1]:
        # round each cumulative boundary: float accumulation would put
        # 0.8+0.1 at 0.9000000000000001 while an oracle written against
        # the literal fractions uses 0.9 — a hash unit in the gap would
        # be classified differently by the two engines
        cum = round(cum + frac, 12)
        conds.append((cum, name))
    for cum, name in reversed(conds):
        expr = F.when(h < F.lit(cum), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def hash_top_n(df: DataFrame, key_col: str, n: int, salt: str = "s") -> DataFrame:
    """Exactly-n deterministic sample: the n rows with the smallest
    key hashes. Plans as TakeOrderedAndProject (parallel partial
    top-n, no full sort). Unlike fraction gating, the size is exact;
    like it, the result is layout- and engine-independent."""
    return df.orderBy(
        _hash_unit(key_col, salt).asc(), F.col(key_col).asc()
    ).limit(n)


def mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    targets: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Resample to TARGET mixture proportions — the domain-reweighting
    pass of pretraining pipelines (DoReMi / The Pile style: given
    per-domain weights, emit the largest corpus whose composition
    matches them exactly).

    The output size is maximal subject to the weights: N = min_s
    floor(n_s / p_s) (the binding stratum is taken whole), each
    stratum keeps k_s = floor(N·p_s) rows. Selection within a stratum
    is the k_s smallest md5 hashes — deterministic, layout-independent
    and superset-stable as weights grow (same contract as hash_sample).

    Everything stays in-plan: per-stratum counts are one tiny
    aggregate, N is a scalar min broadcast back. Weights are converted
    to exact integer ratios (numerators over one common denominator)
    so BOTH the cap and k_s are pure integer arithmetic — bit-identical
    in any engine, no float thresholds. Strata absent from `targets`
    are dropped (weight 0).

    "k_s smallest hashes" is computed by exact RADIX-SELECT, not a
    per-stratum row_number window (which would sort a whole stratum in
    ONE partition — the 100 TB killer): rows bucket by their hash's
    leading 3 hex chars; per-(stratum, bucket) counts (tiny: 4096 × S
    rows) give each bucket's cumulative rank, so buckets below the
    cutoff are kept WHOLE with no sort at all, and only the single
    boundary bucket per stratum — ~n_s/4096 rows — pays a row_number
    window. The keep set is identical to the naive window (hash-prefix
    order == hash order), so the SQL oracle keeps the simple
    row_number form."""
    from fractions import Fraction
    from math import lcm

    from pyspark.sql import Window

    fr = {s: Fraction(p).limit_denominator(10**6) for s, p in targets.items()}
    tot = sum(fr.values())
    if tot == 0:
        raise ValueError("mixture_sample: all-zero targets")
    fr = {s: p / tot for s, p in fr.items()}  # normalize exactly
    den = lcm(*[p.denominator for p in fr.values()])
    num = {s: int(p * den) for s, p in fr.items()}  # p_s = num_s / den

    in_play = df.where(
        F.col(strata_col).isin([s for s, n in num.items() if n > 0])
    )
    cnt = in_play.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    num_expr = F.lit(None).cast("long")
    for s, n in sorted(num.items()):
        if n > 0:
            num_expr = F.when(
                F.col(strata_col) == F.lit(s), F.lit(n)
            ).otherwise(num_expr)
    # N = min_s floor(n_s * den / num_s)  (integer division)
    cap = cnt.select(
        F.min(
            F.floor(F.col("_n") * F.lit(den) / num_expr).cast("long")
        ).alias("_N")
    )
    staged = (
        in_play.crossJoin(F.broadcast(cap))
        .withColumn("_k", F.floor(F.col("_N") * num_expr / F.lit(den)).cast("long"))
        .withColumn("_h", F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))))
        .withColumn("_b", F.conv(F.substring("_h", 1, 3), 16, 10).cast("int"))
    )
    # radix histogram: cumulative count per (stratum, hash-prefix
    # bucket); the window runs over ≤4096 rows per stratum
    bcnt = staged.groupBy(strata_col, "_b", "_k").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    wb = Window.partitionBy(strata_col).orderBy("_b")
    cuts = (
        bcnt.withColumn("_cum", F.sum("_bn").over(wb))
        .withColumn("_prev", F.col("_cum") - F.col("_bn"))
        .where(F.col("_prev") < F.col("_k"))  # kept-whole or boundary
        .select(
            strata_col,
            "_b",
            (F.col("_cum") <= F.col("_k")).alias("_whole"),
            (F.col("_k") - F.col("_prev")).alias("_take"),
        )
    )
    joined = staged.join(F.broadcast(cuts), [strata_col, "_b"])
    whole = joined.where(F.col("_whole"))
    wbound = Window.partitionBy(strata_col, "_b").orderBy(
        F.col("_h").asc(), F.col(key_col).asc()
    )
    boundary = (
        joined.where(~F.col("_whole"))
        .withColumn("_rk", F.row_number().over(wbound))
        .where(F.col("_rk") <= F.col("_take"))
        .drop("_rk")
    )
    drop_cols = ["_N", "_k", "_h", "_b", "_whole", "_take"]
    return whole.drop(*drop_cols).unionByName(boundary.drop(*drop_cols))


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, n: int, salt: str = "w"
) -> DataFrame:
    """Exactly-n WEIGHTED sample without replacement (Efraimidis &
    Spirakis 2006): each row draws u = hash-unit(key) and ranks by
    u^(1/weight); the top n ranks are the sample. Inclusion
    probability is proportional to weight (the A-ES reservoir scheme),
    but — unlike a reservoir — fully deterministic, layout-independent
    and engine-portable, because the "randomness" is the row's own key
    hash. Plans as TakeOrderedAndProject (parallel partial top-n, no
    global sort). Weights must be > 0."""
    u = _hash_unit(key_col, salt)
    rank = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return df.orderBy(rank.desc(), F.col(key_col).asc()).limit(n)
