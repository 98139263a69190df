"""Bounded-memory frequency/cardinality sketches: Count-Min and
HyperLogLog, with engine-reproducible hashing.

The dedup tier already uses MinHash (Jaccard), SimHash (cosine), and
a Bloom bitmap (membership); this module adds the remaining two
members of the classic sketch family a 100 TB corpus job needs:

  * Count-Min (Cormode & Muthukrishnan 2005) — heavy-hitter frequency
    estimates from a d×w counter grid. The grid is built by ONE
    map-side-combinable groupBy over (row, bucket) — d·w rows total
    (KBs), never item-count-sized — and estimates are
    min-over-d-rows lookups. Overestimates only, never under.
  * HyperLogLog (Flajolet et al. 2007) — distinct counts from m
    max-rank registers, built by ONE groupBy over buckets. The rank
    uses length(bin(h)) — INTEGER-exact in both Spark and DuckDB, no
    floating log2 — and Σ2^(−M[j]) is a sum of dyadic rationals that
    is exact in doubles for 32-bit ranks, so the estimator is
    bit-reproducible across engines and partitionings.

All hashing is md5-derived (the sample.py convention): first 8 hex
chars → 32-bit bucket hash, next 8 → rank hash. xxhash64 would be
faster JVM-side but is not reproducible in DuckDB; these sketches are
oracle-checked end to end, which is worth the md5 cost here. For a
pure-Spark hot path, swap _h32 for xxhash64 — the structure is
hash-agnostic.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h32(col: Column, salt: str, off: int = 1) -> Column:
    """32-bit hash from md5(salt:value) hex chars [off, off+8) —
    portable to any engine with md5/substr/hex-parse."""
    h = F.md5(F.concat_ws(":", F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, off, 8), 16, 10).cast("bigint")


def countmin_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cm",
) -> DataFrame:
    """d×w counter grid over item OCCURRENCES (pass a bag: one row per
    occurrence, or pre-aggregated with a `cnt` column). Returns
    (row int, bucket int, cnt bigint) — depth·width rows max."""
    cnt = (
        F.col("cnt").cast("bigint")
        if "cnt" in items.columns
        else F.lit(1).cast("bigint")
    )
    base = items.select(
        F.col(item_col).alias("item"), cnt.alias("occ")
    )
    rows = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            _h32(F.col("item"), f"{salt}{i}"), F.lit(width)
                        ).cast("int").alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
        "occ",
    )
    return (
        rows.groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("occ").alias("cnt"))
    )


def countmin_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cm",
) -> DataFrame:
    """Point-query the grid: est(item) = min over d rows of the item's
    bucket counter. The sketch side is d·w rows → broadcast join;
    candidates can be any size. Guarantee: est ≥ true count, with
    overshoot ≤ 2N/w at probability 1−2^−d. The grid is sparse (only
    occupied cells have rows), so the probe is a LEFT join with
    missing cells read as 0 — an item with any empty cell estimates
    exactly 0, as CMS semantics require."""
    probes = candidates.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            _h32(F.col(item_col), f"{salt}{i}"), F.lit(width)
                        ).cast("int").alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("item", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy("item").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias(
            "cm_est"
        )
    )


HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_registers(
    items: DataFrame, item_col: str, m: int = 64, salt: str = "hll"
) -> DataFrame:
    """(bucket int, mx int): per-bucket max rank. Rank = position of
    the leftmost 1-bit in the 32-bit rank hash = 33 − length(bin(h)),
    integer-exact in both engines; unseen buckets are implicit
    (rank 0) and reconstructed by the estimator."""
    return hll_registers_by(items, [], item_col, m=m, salt=salt)


def hll_estimate(registers: DataFrame, m: int = 64) -> DataFrame:
    """Single-row (n_hll double) from the register table. Σ2^(−mx) is
    dyadic-exact; unseen buckets contribute 2^0 = 1 each. Small-range
    correction (linear counting) when E ≤ 2.5m and empty buckets
    exist — the standard Flajolet et al. estimator."""
    return hll_estimate_by(registers, [], m=m)


def hll_error_bound(m: int) -> float:
    """Standard error 1.04/√m — callers size m from their tolerance."""
    return 1.04 / math.sqrt(m)


def hll_registers_by(
    items: DataFrame,
    group_cols: list[str],
    item_col: str,
    m: int = 64,
    salt: str = "hll",
) -> DataFrame:
    """Per-GROUP HLL registers: (group_cols..., bucket, mx). One
    map-side-combinable groupBy; each group's sketch is m counters
    regardless of its item count — the per-dimension distinct-count
    pass (distinct tokens per language, URLs per domain, …) at
    sketch cost instead of a count(DISTINCT) per group."""
    assert m in HLL_ALPHA or m >= 128, f"unsupported m={m}"
    it = items.select(
        *group_cols, F.col(item_col).alias("item")
    ).where(F.col("item").isNotNull())
    h1 = _h32(F.col("item"), f"{salt}b")
    h2 = _h32(F.col("item"), f"{salt}r", off=9)
    rank = F.when(h2 == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(h2))
    )
    return (
        it.select(
            *group_cols,
            F.pmod(h1, F.lit(m)).cast("int").alias("bucket"),
            rank.cast("int").alias("rank"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("mx"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str] = ()) -> DataFrame:
    """Merge partial sketches by per-bucket max — HLL's defining
    property: registers built on any partition of the data merge to
    EXACTLY the registers of the whole (max is the monoid). This is
    what makes the sketch distributable: per-shard/per-day sketches
    stored KB-sized, unioned and merged at query time instead of
    rescanning the corpus."""
    return (
        registers.groupBy(*group_cols, "bucket")
        .agg(F.max("mx").alias("mx"))
    )


def hll_estimate_by(
    registers: DataFrame, group_cols: list[str], m: int = 64
) -> DataFrame:
    """Per-group estimates (group_cols..., n_hll) from grouped
    registers — same estimator as hll_estimate, one row per group."""
    alpha = HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))
    agg = registers.groupBy(*group_cols).agg(
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("mx"))), F.lit(0.0)
        ).alias("s_seen"),
        F.count(F.lit(1)).alias("n_seen"),
    )
    s = F.col("s_seen") + (F.lit(m) - F.col("n_seen"))
    v = F.lit(m) - F.col("n_seen")
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("n_hll"))
