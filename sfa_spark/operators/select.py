"""Feature selection: χ² and ANOVA-F (SURVEY §2.4 Q8, §2.5 B5).

Reference parity:
  * χ² word selection — WEASEL.trainChiSquared
    (`/root/reference/src/main/java/sfa/transformation/WEASEL.java:217-339`):
    observed = per-(class, word) count sum; expected = p(class) ·
    total(word); χ² = Σ_classes (obs − exp)²/exp; keep χ² ≥ limit,
    capped at WORD_LIMIT by χ² desc.
  * ANOVA F ranking  — SFASupervised.getFoneway
    (`.../transformation/SFASupervised.java:105-219`, a port of sklearn
    f_oneway): rank coefficient indices by F, keep top word_length.

Both are pure group-aggregate cascades — Catalyst plans them as two
hash aggregations + a broadcast join; at 100 TB the per-word/per-coef
side is vocabulary-sized, not data-sized.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chi_squared(
    bags_labeled: DataFrame,
    limit: float = 2.0,
    word_limit: int | None = 10000,
    key_col: str = "word",
) -> DataFrame:
    """(series_id, word, cnt, label) → (word, chi2) surviving selection."""
    per_cw = bags_labeled.groupBy("label", key_col).agg(
        F.sum("cnt").cast("double").alias("obs")
    )
    per_w = per_cw.groupBy(key_col).agg(F.sum("obs").alias("tot_w"))
    per_c = per_cw.groupBy("label").agg(F.sum("obs").alias("tot_c"))
    # grand total stays in-plan (broadcast 1-row aggregate) — a collect()
    # here would recompute the upstream bag chain as an extra job
    total = per_cw.agg(F.sum("obs").alias("total"))
    chi = (
        per_cw.join(per_w, key_col)
        .join(F.broadcast(per_c), "label")
        .crossJoin(F.broadcast(total))
        .withColumn("exp", F.col("tot_w") * F.col("tot_c") / F.col("total"))
        .withColumn(
            "term", (F.col("obs") - F.col("exp")) ** 2 / F.col("exp")
        )
        .groupBy(key_col)
        .agg(F.sum("term").alias("chi2"))
        .where(F.col("chi2") >= limit)
    )
    if word_limit is not None:
        w = Window.orderBy(F.col("chi2").desc(), F.col(key_col).asc())
        chi = (
            chi.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= word_limit)
            .drop("rk")
        )
    return chi


def chi2_sf(x: float, dof: int) -> float:
    """Survival function of the χ² distribution for integer dof —
    pure-python (no scipy in this environment; reference uses
    commons-math ChiSquaredDistribution, WEASEL.java:346-475).

    Even dof: closed form exp(−x/2)·Σ_{k<dof/2} (x/2)^k/k!.
    Odd dof: recurrence seeded by erfc(√(x/2))."""
    import math

    if x <= 0:
        return 1.0
    h = x / 2.0
    if dof % 2 == 0:
        term, acc = 1.0, 1.0
        for k in range(1, dof // 2):
            term *= h / k
            acc += term
        return min(1.0, math.exp(-h) * acc)
    # odd dof: P(X > x) = erfc(√h) + exp(−h)·Σ ... via Q(a+1) = Q(a) + h^a e^−h / Γ(a+1)
    sf = math.erfc(math.sqrt(h))
    a = 0.5
    for _ in range(dof // 2):
        sf += math.exp(a * math.log(h) - h - math.lgamma(a + 1.0))
        a += 1.0
    return min(1.0, sf)


def chi_squared_pvalues(
    bags_labeled: DataFrame,
    p_limit: float = 0.05,
    key_col: str = "word",
) -> DataFrame:
    """trainChiSquared_new: keep keys whose χ² p-value ≤ p_limit.
    The χ² statistic comes from the same SQL aggregate cascade; the
    p-value map is a scalar pandas UDF over it (dof = #classes − 1)."""
    from pyspark.sql.functions import pandas_udf

    n_classes = bags_labeled.select("label").distinct().count()
    dof = max(1, n_classes - 1)
    stats = chi_squared(bags_labeled, limit=-1.0, word_limit=None, key_col=key_col)

    @pandas_udf("double")
    def _sf(xs: pd.Series) -> pd.Series:
        return xs.map(lambda x: chi2_sf(float(x), dof))

    return stats.withColumn("p_value", _sf("chi2")).where(
        F.col("p_value") <= p_limit
    )


def filter_bags(bags: DataFrame, selected: DataFrame, key_col: str = "word") -> DataFrame:
    """Prune bags to the selected vocabulary (reference filterChiSquared).
    Broadcast semi-join — the selected set is vocabulary-sized."""
    return bags.join(
        F.broadcast(selected.select(key_col)), key_col, "left_semi"
    )


def anova_f(coef_labeled: DataFrame) -> DataFrame:
    """One-way ANOVA F statistic per coefficient index.

    Input: (seg int, coef double, label). Output: (seg, f_stat).
    Sufficient statistics only — Σv, Σv², count per (seg, label):
      ssbn = Σ_groups (Σv)²/n_g − (Σ_all v)²/N      (between-group)
      sswn = Σ_all v² − Σ_groups (Σv)²/n_g          (within-group)
      F    = (ssbn/(k−1)) / (sswn/(N−k))
    Matches sklearn/reference f_oneway algebraically.
    """
    g = coef_labeled.groupBy("seg", "label").agg(
        F.sum("coef").alias("s"),
        F.sum(F.col("coef") * F.col("coef")).alias("ss"),
        F.count(F.lit(1)).cast("double").alias("m"),
    )
    tot = g.groupBy("seg").agg(
        F.sum("s").alias("S"),
        F.sum("ss").alias("SS"),
        F.sum("m").alias("N"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.col("s") * F.col("s") / F.col("m")).alias("sq_over_m"),
    )
    ssbn = F.col("sq_over_m") - F.col("S") * F.col("S") / F.col("N")
    sswn = F.col("SS") - F.col("sq_over_m")
    msb = ssbn / (F.col("k") - 1)
    msw = sswn / (F.col("N") - F.col("k"))
    return tot.select(
        "seg",
        F.when(F.abs(msw) < 1e-12, F.lit(0.0)).otherwise(msb / msw).alias("f_stat"),
    )


def top_coefficients(f_stats: DataFrame, word_length: int) -> DataFrame:
    """Keep the word_length best coefficient indices by F desc
    (tie → seg asc), as the reference's bestValues array."""
    w = Window.orderBy(F.col("f_stat").desc(), F.col("seg").asc())
    return (
        f_stats.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= word_length)
    )
