"""Bucketed-table sink: persist a hash partitioning INTO the file
layout so downstream jobs never pay the canonical shuffle again.

PLANS.md's 100 TB capacity table (row 1) claims the one canonical
series Exchange "disappears entirely" when the events log is WRITTEN
bucketed by series id. This module is that claim made real: Spark
bucketed tables (``bucketBy`` + ``saveAsTable``) record the bucket
spec in the catalog, a scan of the table reports
``HashPartitioning(bucket_col, n_buckets)`` as its output
partitioning, and Catalyst then elides the Exchange for every
groupBy / window / co-bucketed join keyed on the bucket column —
tests/test_sources.py asserts all three plans are Exchange-free.

Sizing at 100 TB: n_buckets ≈ table bytes / 250 MB (the shuffle
partition target), rounded to a power of two so future unions of
re-bucketed increments line up; with 10⁸ series at ~1 KB/row that is
the 65536 of PLANS.md. Buckets are also the parallelism ceiling for
bucket-local stages — keep n_buckets ≥ cluster cores.

Reference parity note: the reference engine re-sorts its on-disk
series files per query run (SFATrie bulk-load, see SURVEY §2.8); a
bucketed parquet table is the Spark-native equivalent of that
"load once, query many" layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize ``df`` as a parquet bucketed table and return the
    catalog-backed scan of it.

    ``sort_cols`` additionally sorts within each bucket file
    (``sortBy``) so bucket-local window/merge-join stages skip their
    Sort too when Spark can prove per-file ordering (one file per
    bucket). ``path`` makes the table external (data at ``path``,
    only metadata in the catalog) — use it everywhere in tests and
    anywhere the warehouse dir is not the intended location.

    The returned DataFrame MUST come from ``spark.table`` — reading
    the parquet directory directly loses the bucket spec (it lives in
    the catalog, not the files) and reintroduces the Exchange.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(
        n_buckets, bucket_col
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return df.sparkSession.table(table)
