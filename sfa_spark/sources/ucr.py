"""UCR time-series file reader.

Reference parity: TimeSeriesLoader.loadDataset
(`/root/reference/src/main/java/sfa/timeseries/TimeSeriesLoader.java:31-83`):
one series per line, `label, v1..vn` (comma or whitespace separated),
lines starting with '@' skipped, NaN values dropped, per-series z-norm
applied by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ucr(spark: SparkSession, path: str) -> DataFrame:
    """Read a UCR-format text file into array form.

    Output: (series_id bigint, label double, values array<double>).
    Distributed scan: spark.read.text parallelizes across file splits;
    parsing is pure built-in expressions (no Python UDF).
    """
    lines = spark.read.text(path).where(~F.col("value").startswith("@"))
    toks = F.split(F.trim(F.regexp_replace("value", r"[,\s]+", " ")), " ")
    parsed = lines.select(
        F.monotonically_increasing_id().alias("series_id"),
        toks.alias("toks"),
    )
    # try_cast everywhere: ANSI-safe when Catalyst combines the header
    # filter with later filters, and it implements the reference's
    # tolerant parsing (malformed / NaN tokens dropped) in one shot.
    return parsed.select(
        "series_id",
        F.element_at("toks", 1).try_cast("double").alias("label"),
        F.filter(
            F.transform(F.slice("toks", 2, 1_000_000), lambda t: t.try_cast("double")),
            lambda v: v.isNotNull() & ~F.isnan(v),
        ).alias("values"),
    ).where(F.size("values") > 0)


def arrays_to_long(arrays: DataFrame) -> DataFrame:
    """Array form → canonical long form (series_id, pos, value, n)."""
    return arrays.select(
        "series_id",
        F.posexplode("values").alias("pos", "value"),
        F.size("values").cast("bigint").alias("n"),
    ).select("series_id", F.col("pos").cast("bigint").alias("pos"), "value", "n")
