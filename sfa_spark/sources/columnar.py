"""Columnar interchange formats beyond parquet: ORC round-trip and
schema-evolution (mergeSchema) reads.

ORC is Spark-native (no extra deps) and common as the exchange format
from Hive-era warehouses; a 100 TB ingest frequently starts as "read
someone else's ORC". Schema evolution is the other unavoidable
reality: an append-only corpus gains columns over time, and the engine
must read the union of schemas without rewriting old files —
``mergeSchema`` unions parquet footers at planning time (old files
yield NULL for new columns; per-file pruning still applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write as ORC (zlib default). n_files controls output-file count
    the same way the JSONL sink does — repartition BEFORE the write so
    the files land balanced."""
    if n_files:
        df = df.repartition(int(n_files))
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC; filter pushdown and column pruning work exactly as
    for parquet (spark.sql.orc.filterPushdown defaults true)."""
    return spark.read.orc(path)


def read_evolved_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet directories written under DIFFERENT schema versions
    as one frame: mergeSchema=true unions the schemas at planning time;
    files missing a column produce NULLs for it — no rewrite of old
    data, no failed scan. Column order is the union in
    first-seen order; pass the result through a .select to pin a
    contract schema downstream."""
    return (
        spark.read.option("mergeSchema", "true").parquet(*paths)
    )
