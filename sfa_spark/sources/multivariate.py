"""Multivariate series support (SURVEY S2, S4).

Reference parity:
  * loadMultivariateDatset (`/root/reference/src/main/java/sfa/timeseries/TimeSeriesLoader.java:169-223`):
    long format (id, timestamp, label, dim1..dimk); timestamps parsed
    then discarded — order is positional. Here the long format IS the
    canonical storage: (series_id, dim, pos, value, n).
  * getDerivatives (`TimeSeriesLoader.java:225-241`): per dim, append a
    channel of |x[i+1] − x[i]| as dims k..2k−1, doubling the dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def wide_to_long(
    df: DataFrame,
    id_col: str,
    order_col: str,
    dim_cols: list[str],
    label_col: str | None = None,
) -> DataFrame:
    """Wide (id, ts, label, dim1..dimk) → (series_id, dim, pos, value, n).
    One shuffle on series_id; dims stack via an unpivot-style explode."""
    w_ord = Window.partitionBy("series_id").orderBy(order_col)
    base = df.select(
        F.col(id_col).cast("bigint").alias("series_id"),
        F.col(order_col),
        F.array(
            *[
                F.struct(F.lit(i).alias("dim"), F.col(c).cast("double").alias("value"))
                for i, c in enumerate(dim_cols)
            ]
        ).alias("dims"),
    ).withColumn("pos", (F.row_number().over(w_ord) - 1).cast("bigint"))
    n = Window.partitionBy("series_id")
    return (
        base.withColumn("n", F.count(F.lit(1)).over(n).cast("bigint"))
        .select("series_id", "pos", "n", F.explode("dims").alias("d"))
        .select("series_id", F.col("d.dim").alias("dim"), "pos", F.col("d.value").alias("value"), "n")
    )


def derivatives(mv_long: DataFrame, n_dims: int, pad_last: bool = False) -> DataFrame:
    """Append per-dim |first difference| channels as dims n_dims..2n−1.

    pad_last=False (default): derivative series has length n−1 (the
    difference channel's natural support).
    pad_last=True: exact reference parity — `getDerivatives`
    (`TimeSeriesLoader.java:227-241`) allocates `new double[n]` and
    fills indices 0..n−2, so the derivative channel keeps length n with
    a trailing 0.0. Use this for fixture-parity classification runs."""
    w = Window.partitionBy("series_id", "dim").orderBy("pos")
    nxt = F.lead("value").over(w)
    if pad_last:
        deriv = mv_long.withColumn("nxt", nxt).select(
            "series_id",
            (F.col("dim") + n_dims).alias("dim"),
            "pos",
            F.when(
                F.col("nxt").isNull(), F.lit(0.0)
            ).otherwise(F.abs(F.col("nxt") - F.col("value"))).alias("value"),
            "n",
        )
    else:
        deriv = (
            mv_long.withColumn("nxt", nxt)
            .where(F.col("nxt").isNotNull())
            .select(
                "series_id",
                (F.col("dim") + n_dims).alias("dim"),
                "pos",
                F.abs(F.col("nxt") - F.col("value")).alias("value"),
                (F.col("n") - 1).alias("n"),
            )
        )
    return mv_long.unionByName(deriv)


def read_multivariate_file(
    spark, path: str, use_derivatives: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Read the reference's space-separated multivariate format
    (`TimeSeriesLoader.loadMultivariateDatset`,
    `TimeSeriesLoader.java:169-223`): each line is
    `id timestamp label dim1 .. dimk`; the timestamp orders positions
    within a series and the label is taken per-series (constant across
    a series's lines). Distributed CSV scan → canonical long layout.

    Returns (mv_long(series_id, dim, pos, value, n),
             labels(series_id, label))."""
    raw = spark.read.option("sep", " ").csv(path)
    cols = raw.columns
    dim_cols = [f"d{i}" for i in range(len(cols) - 3)]
    df = raw.select(
        F.col(cols[0]).cast("bigint").alias("series_id"),
        F.col(cols[1]).cast("bigint").alias("ts"),
        F.col(cols[2]).cast("double").alias("label"),
        *[
            F.col(c).cast("double").alias(a)
            for c, a in zip(cols[3:], dim_cols)
        ],
    )
    mv = wide_to_long(df, "series_id", "ts", dim_cols)
    labels = df.groupBy("series_id").agg(F.min("label").alias("label"))
    if use_derivatives:
        mv = derivatives(mv, len(dim_cols), pad_last=True)
    return mv, labels


def dim_arrays(mv_long: DataFrame) -> DataFrame:
    """(series_id, dim, values array<double>) — per-dim array form for
    the spectral pandas UDFs."""
    return (
        mv_long.groupBy("series_id", "dim")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "value"))),
                lambda s: s["value"],
            ).alias("values")
        )
    )
