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


def zorder_key(cols: list[str], stats: dict, bits: int = 8):
    """Morton (Z-order) key expression over ``cols``: each column is
    scaled to a ``bits``-bit integer against its (min, max) from
    ``stats``, then the bits are interleaved (cols[0] highest). Pure
    codegen arithmetic — no UDF."""
    from pyspark.sql import functions as F

    n = len(cols)
    scaled = []
    for c in cols:
        lo, hi = stats[c]
        span = float(hi - lo) or 1.0
        code = F.least(
            F.lit((1 << bits) - 1),
            F.floor(
                (F.col(c).cast("double") - F.lit(float(lo)))
                / F.lit(span)
                * F.lit(float(1 << bits))
            ).cast("long"),
        )
        scaled.append(F.greatest(F.lit(0), code))
    z = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):  # msb first
        for j, s in enumerate(scaled):
            shift = i * n + (n - 1 - j)
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(s, i).bitwiseAND(F.lit(1)), shift)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_cells: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out along a Z-order curve over
    ``cols`` — the multi-column data-skipping layout.

    A single-column sort gives parquet row groups tight min/max stats
    on THAT column only; predicates on any other column can prune
    nothing. Z-ordering interleaves the bits of all ``cols``, so each
    cell covers a small hyper-rectangle and its stats stay narrow on
    EVERY z-column — a pushed-down predicate on any of them skips most
    of the table (test_sources asserts this from the actual parquet
    footers). The same layout trick as lakehouse OPTIMIZE ZORDER.

    The table is split at the top log2(n_cells) bits of the key —
    cell-ALIGNED, never mid-cell, via a hive ``partitionBy(zcell)``
    directory per cell. Alignment matters: parquet min/max is
    insensitive to row counts, so even a one-row sliver from a
    neighboring cell (which a sampled range-split produces) blows a
    file's range open on the off-axis columns. The directory form is
    also deterministic end-to-end (no range-boundary sampling) and
    gives partition PRUNING on z-range predicates for free, on top of
    the footer stats; rows are z-sorted within each cell so row groups
    nest the same property at finer grain.

    Scaling uses global (min, max) per column (one tiny agg job). For
    heavily skewed columns substitute equi-depth codes (approxQuantile
    cuts) before interleaving — the key expression is unchanged.
    At 100 TB: n_cells ≈ table bytes / 1 GB, rounded to a power of
    two; one hash shuffle on the cell id is the only wide stage.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    assert n * bits <= 62, "n_cols * bits must fit a positive long"
    k = max(1, (n_cells - 1).bit_length())  # ceil(log2), ≥ 2 cells
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    for c in cols:
        # min/max come back None iff the column is entirely NULL —
        # zorder_key would then crash on float(None - None); an
        # all-NULL column cannot be z-ordered, so fail loudly
        if row[f"_lo_{c}"] is None:
            # data-dependent validation must survive python -O, so a
            # bare assert (compiled out) is not enough here
            raise ValueError(
                f"z-order column {c!r} is entirely NULL — cannot "
                "derive a range"
            )
    stats = {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in cols}
    z = zorder_key(cols, stats, bits=bits)
    # rows with a NULL in ANY z-column would silently encode to code 0
    # (greatest(0, NULL) → 0) and pollute the low corner cell's min/max
    # ranges — route them to a dedicated cell instead so footer stats
    # on the real low cell stay narrow
    has_null = F.lit(False)
    for c in cols:
        has_null = has_null | F.col(c).isNull()
    (
        df.withColumn("_z", z)
        .withColumn(
            "zcell",
            F.when(has_null, F.lit(-1))
            .otherwise(F.shiftright("_z", n * bits - k))
            .cast("int"),
        )
        .repartition(F.col("zcell"))
        .sortWithinPartitions("zcell", "_z")
        .drop("_z")
        .write.mode(mode)
        .partitionBy("zcell")
        .parquet(path)
    )
