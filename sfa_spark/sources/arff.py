"""ARFF multivariate reader (SURVEY S3).

Reference parity: TimeSeriesLoader.loadMultivariateDatsetArff
(`/root/reference/src/main/java/sfa/timeseries/TimeSeriesLoader.java:93-167`):
lines with '@'/'%' skipped; '\\n' escapes separate dimensions; last
comma field is the class (string classes mapped to doubles via a
deterministic dictionary — here sorted-first-seen via StringIndexer-
style rank instead of the reference's mutable insertion map); '?'
encodes missing values (dropped).

Distributed parse: spark.read.text → built-in expressions; the class
mapping is a tiny aggregate joined back (no driver mutation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_arff_multivariate(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Returns (mv_arrays, labels):
    mv_arrays = (series_id, dim, values array<double>),
    labels    = (series_id, label double).
    """
    lines = (
        spark.read.text(path)
        .where(
            ~F.col("value").contains("@")
            & ~F.col("value").contains("%")
            & (F.length(F.trim("value")) > 0)
        )
        .withColumn("series_id", F.monotonically_increasing_id())
    )
    parsed = lines.select(
        "series_id",
        F.regexp_replace("value", r"\\n", ";").alias("line"),
    ).select(
        "series_id",
        F.regexp_extract("line", r"([^,]+)$", 1).alias("label_str"),
        # strip leading quote/char and the trailing ,label (reference
        # substring(1, lastIndexOf(',')-1) also drops a trailing quote)
        F.expr("substring(line, 2, length(line) - length(regexp_extract(line, '([^,]+)$', 1)) - 3)").alias("body"),
    )
    # string→double class mapping: numeric labels pass through; novel
    # string classes get ranks after the numeric range (deterministic:
    # sorted, not insertion order — documented deviation)
    numeric = F.col("label_str").try_cast("double")
    str_classes = (
        parsed.where(numeric.isNull())
        .select("label_str")
        .distinct()
        .withColumn("mapped", F.row_number().over(Window.partitionBy(F.lit(0)).orderBy("label_str")).cast("double"))
    )
    labels = (
        parsed.join(F.broadcast(str_classes), "label_str", "left")
        .select(
            "series_id",
            F.coalesce(numeric, F.col("mapped")).alias("label"),
        )
    )
    mv = parsed.select(
        "series_id",
        F.posexplode(F.split("body", ";")).alias("dim", "dim_str"),
    ).select(
        "series_id",
        F.col("dim").cast("int").alias("dim"),
        F.filter(
            F.transform(F.split("dim_str", ","), lambda t: t.try_cast("double")),
            lambda v: v.isNotNull(),  # '?' and malformed → null → dropped
        ).alias("values"),
    )
    return mv, labels
