"""Seeded synthetic series generators.

Reference parity: TimeSeriesLoader.generateRandomWalkData
(`/root/reference/src/main/java/sfa/timeseries/TimeSeriesLoader.java:321-332`)
— Gaussian random walk. Spark-native: spark.range + randn(seed) +
a running-sum window, fully distributed and deterministic per seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def random_walk(
    spark: SparkSession, n_series: int, length: int, seed: int = 42
) -> DataFrame:
    """Long-form corpus of seeded Gaussian random walks.

    Scale note: the cumulative sum windows per series (not globally), so
    parallelism is across series; generation is embarrassingly parallel.
    """
    base = spark.range(n_series * length).select(
        (F.col("id") / length).cast("bigint").alias("series_id"),
        (F.col("id") % length).cast("bigint").alias("pos"),
        F.randn(seed).alias("step"),
    )
    w = (
        Window.partitionBy("series_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return base.select(
        "series_id",
        "pos",
        F.sum("step").over(w).alias("value"),
        F.lit(length).cast("bigint").alias("n"),
    )
