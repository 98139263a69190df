"""Windowing & per-series normalization (SURVEY §2.2, P1-P5).

Reference parity:
  * znorm           — TimeSeries.norm (`/root/reference/src/main/java/sfa/timeseries/TimeSeries.java:62-99`)
  * rolling_stats   — TimeSeries.calcIncrementalMeanStddev (`TimeSeries.java:218-248`)
  * sliding_long    — TimeSeries.getSubsequences (`TimeSeries.java:191-213`)
  * disjoint_long   — TimeSeries.getDisjointSequences (`TimeSeries.java:256-270`)

All pure SQL/Window expressions — whole-stage-codegen'd, no Python in
the hot path. Every window spec partitions by series_id, so after the
single series_from_events shuffle these ops add NO further exchanges
(Catalyst reuses the child's output partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-8  # stddev guard; reference uses stddev>0 ? stddev : 1 (TimeSeries.java:92-97)


def _guarded(std):
    return F.when(std < EPS, F.lit(1.0)).otherwise(std)


def znorm(long_df: DataFrame, mean_norm: bool = True) -> DataFrame:
    """Per-series z-normalization: (v - mean)/stddev_pop, stddev 0 → 1.

    mean_norm=False keeps the mean (reference norm(false), divides only).
    """
    w = Window.partitionBy("series_id")
    mean = F.avg("value").over(w)
    std = _guarded(F.stddev_pop("value").over(w))
    centered = (F.col("value") - mean) if mean_norm else F.col("value")
    return long_df.withColumn("value_z", centered / std)


def rolling_stats(long_df: DataFrame, w: int) -> DataFrame:
    """Forward-looking rolling mean/std over [pos, pos+w-1] per series.

    This IS the reference's O(1)-update incremental mean/std — Spark's
    WindowExec maintains the sliding frame natively; we just declare it.
    Rows with pos > n-w are partial frames (flagged valid_start=false).
    """
    frame = (
        Window.partitionBy("series_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    return (
        long_df.withColumn("r_mean", F.avg("value").over(frame))
        .withColumn("r_std", F.stddev_pop("value").over(frame))
        .withColumn("valid_start", F.col("pos") <= F.col("n") - w)
    )


def sliding_long(long_df: DataFrame, w: int) -> DataFrame:
    """Explode into all sliding windows of length w (long form).

    Output: (series_id, win, off, value, n) — row (series, pos) is
    replicated into every window that covers it: win ∈
    [max(pos-w+1,0), min(pos, n-w)], off = pos - win ∈ [0, w).

    Scale: deliberate w× amplification to keep everything SQL-side; for
    large w the MFT recurrence path (functions/spectral.py) avoids it by
    computing all window transforms inside one Arrow batch per series.
    Series shorter than w are dropped (reference guard WEASEL.java:129).
    """
    df = long_df.where(F.col("n") >= w)
    win = F.explode(
        F.sequence(
            F.greatest(F.col("pos") - F.lit(w - 1), F.lit(0).cast("bigint")),
            F.least(F.col("pos"), F.col("n") - F.lit(w)),
        )
    ).alias("win")
    return df.select("series_id", win, "pos", "value", "n").withColumn(
        "off", F.col("pos") - F.col("win")
    )


def disjoint_long(long_df: DataFrame, w: int) -> DataFrame:
    """Non-overlapping windows of length w; partial tail dropped.

    Output: (series_id, win, off, value, n). Pure projection — no
    shuffle at all (win/off derive from pos arithmetically).
    """
    return (
        long_df.where(F.col("pos") < (F.col("n") - F.col("n") % w))
        .withColumn("win", (F.col("pos") / w).cast("bigint"))
        .withColumn("off", F.col("pos") % w)
    )


def window_znorm(win_long: DataFrame, mean_norm: bool = True) -> DataFrame:
    """Z-normalize each (series_id, win) group in-place.

    Same single-pass window aggregate as znorm, partitioned by
    (series_id, win) — executor-local after the sliding explode.
    """
    w = Window.partitionBy("series_id", "win")
    mean = F.avg("value").over(w)
    std = _guarded(F.stddev_pop("value").over(w))
    centered = (F.col("value") - mean) if mean_norm else F.col("value")
    return win_long.withColumn("value_z", centered / std)


def subsequence(long_df: DataFrame, offset: int, w: int) -> DataFrame:
    """One window at (offset, w) per series, z-normed (reference
    TimeSeries.getSubsequence, used by TEASER prefix snapshots)."""
    sliced = long_df.where(
        (F.col("pos") >= offset) & (F.col("pos") < offset + w)
    ).select(
        "series_id",
        F.lit(0).cast("bigint").alias("win"),
        (F.col("pos") - offset).alias("off"),
        "value",
        "n",
    )
    return window_znorm(sliced)
