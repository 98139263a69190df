"""Table maintenance: small-file compaction.

Streaming sinks, incremental appends, and over-parallel writers leave
parquet directories fragmented into thousands of KB-sized files; at
100 TB that is the classic small-file problem (per-file open/footer
cost dominates the scan, listing crushes the driver / namenode). The
standard fix is a periodic bin-packing rewrite into ~target-size
files — lakehouse OPTIMIZE, rewritten here as plain Spark.

Sizing comes from the ACTUAL on-disk bytes, not a row-count guess:
n_out = ceil(total_bytes / target_bytes). The rewrite publishes in
two phases (write `_compact_next`, atomic rename swap) so readers
never observe a half-written directory — the same publish discipline
as streaming/sinks.upsert_latest.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory tree."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    in_place: bool = True,
    out_path: str | None = None,
) -> DataFrame:
    """Rewrite the parquet directory at ``path`` into
    ceil(total/target) files and return the scan of the result.

    ``in_place=True`` swaps the compacted data into ``path`` itself
    (two-phase rename); otherwise writes to ``out_path``. Row contents
    and schema are untouched — only the file layout changes.

    Crash behavior of the in-place swap: a previous run that died
    mid-swap is REPAIRED on entry — a stranded ``_compact_old`` with no
    live ``path`` is renamed back, and leftover temp directories are
    cleared, so no manual cleanup is ever needed and data is never
    lost (every byte exists at ``path`` or ``_compact_old`` at all
    times). The one residual race — a reader listing ``path`` in the
    instant between the two renames — is inherent to plain
    directories; production tables take the pointer-file route
    (streaming/sinks.py) or a table format's commit instead.
    """
    nxt = path.rstrip("/") + "_compact_next"
    old = path.rstrip("/") + "_compact_old"
    # repair a crashed previous swap, then clear temp leftovers
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    shutil.rmtree(nxt, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    _, total = dir_stats(path)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    if in_place:
        df.repartition(n_out).write.mode("overwrite").parquet(nxt)
        os.rename(path, old)
        os.rename(nxt, path)
        shutil.rmtree(old, ignore_errors=True)
        return spark.read.parquet(path)
    assert out_path, "out_path required when in_place=False"
    df.repartition(n_out).write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
