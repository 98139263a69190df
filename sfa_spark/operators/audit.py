"""Pipeline data-quality instrumentation via ``df.observe``.

A 100 TB job cannot afford a second scan just to know what it
processed. ``Observation`` attaches aggregate metrics (row counts,
null counts, ranges) to a frame that are computed AS A SIDE EFFECT of
whatever action runs anyway — the metrics ride the existing job's
partials to the driver, zero extra jobs, zero extra scans. The same
``observe`` call works on streaming queries (metrics arrive per
micro-batch in StreamingQueryProgress.observedMetrics), which is how
an ingest gate reports drop rates without a second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_metrics(cols: list[str]) -> list:
    """Standard health metrics: total rows + per-column null counts
    (schema-drift / upstream-corruption detectors)."""
    m = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        m.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    return m


def with_observation(df: DataFrame, name: str, cols: list[str]):
    """Attach quality metrics; returns (instrumented_df, observation).
    Run any action on the returned frame, then read
    ``observation.get`` — a dict of the metrics for exactly the rows
    that action consumed."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *quality_metrics(cols)), obs


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    with_payload: bool = False,
) -> DataFrame:
    """Classify rows between two snapshots of a keyed table:
    ``added`` (key only in new), ``removed`` (key only in old),
    ``changed`` (key in both, any compare column differs null-safely).
    Unchanged rows are dropped — on a 100 TB table the output is the
    (tiny) delta, never the table.

    Scale shape: each side is projected to (key, struct(compare_cols))
    BEFORE the join, so the shuffle carries only the compared columns;
    one full-outer sort-merge join on the key — with both snapshots
    bucketed/partitioned by the key (sources/sink.write_bucketed) the
    Exchange elides entirely and the diff is a per-bucket zip. The
    struct comparison is eqNullSafe (NULL == NULL), mirroring SQL's
    IS NOT DISTINCT FROM, so NULL churn never shows as phantom change.

    with_payload=True additionally emits the NEW-side compare columns
    (NULL for removed rows), making the diff a self-contained CDC
    batch: mapping added/changed → op 'U' and removed → op 'D' and
    feeding it to ``apply_changes`` reconstructs `new` from `old`
    exactly (property-tested roundtrip,
    tests/test_llm_ops.py::test_diff_apply_roundtrip_reconstructs_new).
    """
    compare_cols = compare_cols or [
        c for c in new.columns if c not in key_cols
    ]
    oh = old.select(
        *key_cols,
        F.struct(*compare_cols).alias("_old"),
        F.lit(1).alias("_in_old"),
    )
    nh = new.select(
        *key_cols,
        F.struct(*compare_cols).alias("_new"),
        F.lit(1).alias("_in_new"),
    )
    j = oh.join(nh, key_cols, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("changed"))
    )
    extra = (
        [F.col(f"_new.{c}").alias(c) for c in compare_cols]
        if with_payload
        else []
    )
    return (
        j.select(*key_cols, status.alias("status"), *extra)
        .where(F.col("status").isNotNull())
    )


def drift_psi(
    old: DataFrame,
    new: DataFrame,
    col: str,
    n_buckets: int = 10,
    eps: float = 1e-6,
    buckets: str = "width",
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift alarm between training-data versions:
    equi-width buckets over the COMBINED [min, max], per-side bucket
    shares, per-bucket PSI term (p_new − p_old)·ln(p_new / p_old) with
    shares floored at ``eps`` so empty buckets stay finite
    (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 drifted).

    Output: one row per OCCUPIED bucket — (bucket, n_old, n_new,
    share_old, share_new, psi_term); total PSI = sum(psi_term).

    Scale shape: both sides scan once into a side-tagged union; ONE
    map-side-combinable groupBy(bucket) carries conditional partial
    sums for both sides; the global range and side totals are
    single-row aggregates broadcast back. No join between the
    snapshots, no window, no second scan of either side.

    buckets="quantile" replaces the equi-width edges with the exact
    deciles of the OLD (reference) side — the standard PSI binning,
    and robust where equi-width degrades: one extreme outlier in
    either side stretches the combined [min, max] until nearly all
    mass lands in a single bucket. Edges come from ONE
    percentile-array aggregate over old (same exact-percentile
    machinery as temporal.winsorize, Spark percentile == DuckDB
    quantile_cont), rounded to 6 dp on both engines so bucket
    assignment can't flip on a final-ulp divergence; assignment is a
    JVM-side size(filter(edges, e -> v > e)) — still no join, no
    window, one groupBy.
    """
    u = old.select(F.col(col).alias("v"), F.lit(0).alias("side")).unionByName(
        new.select(F.col(col).alias("v"), F.lit(1).alias("side"))
    ).where(F.col("v").isNotNull())
    if buckets == "quantile":
        fracs = ", ".join(
            str(i / n_buckets) for i in range(1, n_buckets)
        )
        edges = (
            old.select(F.col(col).alias("v"))
            .where(F.col("v").isNotNull())
            .agg(
                F.expr(
                    f"transform(percentile(v, array({fracs})), "
                    "e -> round(e, 6))"
                ).alias("edges")
            )
        )
        # Loud degenerate-reference guard (the write_zordered all-NULL
        # move): an empty or all-NULL old side makes percentile() NULL,
        # which would silently bucket every row as NULL and collapse
        # the PSI to nothing. assert_true aborts the plan instead.
        gate = F.assert_true(
            F.col("edges").isNotNull(),
            F.lit(
                "drift_psi(buckets='quantile'): reference (old) side "
                "has no non-null values — quantile edges are "
                "undefined; fix the reference snapshot or use "
                "buckets='width'"
            ),
        ).isNull()
        b = (
            u.crossJoin(F.broadcast(edges))
            .where(gate)
            .select(
                F.size(
                    F.filter("edges", lambda e: F.col("v") > e)
                ).alias("bucket"),
                "side",
            )
        )
    elif buckets == "width":
        r = u.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        width = (F.col("hi") - F.col("lo")) / F.lit(float(n_buckets))
        b = u.crossJoin(F.broadcast(r)).select(
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor((F.col("v") - F.col("lo")) / width).cast("int"),
                )
            )
            .alias("bucket"),
            "side",
        )
    else:
        raise ValueError(f"buckets must be 'width' or 'quantile', got {buckets!r}")
    counts = b.groupBy("bucket").agg(
        F.sum((F.col("side") == 0).cast("long")).cast("bigint").alias("n_old"),
        F.sum((F.col("side") == 1).cast("long")).cast("bigint").alias("n_new"),
    )
    totals = counts.agg(
        F.sum("n_old").cast("bigint").alias("t_old"),
        F.sum("n_new").cast("bigint").alias("t_new"),
    )
    p_old = F.greatest(F.col("n_old") / F.col("t_old"), F.lit(float(eps)))
    p_new = F.greatest(F.col("n_new") / F.col("t_new"), F.lit(float(eps)))
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "n_old",
        "n_new",
        p_old.alias("share_old"),
        p_new.alias("share_new"),
        ((p_new - p_old) * F.log(p_new / p_old)).alias("psi_term"),
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """MERGE INTO / CDC-apply: produce the next snapshot of a keyed
    table from the current snapshot plus a change batch with an op
    column ('U' upsert, 'D' delete) and a sequence column. When a key
    appears multiple times in the batch, the row with the HIGHEST
    (seq) wins (ties broken by op descending so 'U' beats 'D' at equal
    seq — deterministic, documented). Two rows with the SAME (key,
    seq, op) but different payloads are a producer bug: max_by picks
    one arbitrarily — give CDC batches a strictly monotonic seq per
    key. An upsert for an absent key inserts; a delete for an absent
    key is a no-op.

    Scale shape: the batch first collapses to one winner per key via a
    map-side-combinable max_by aggregate (never a window over the
    batch), then ONE full-outer join against the snapshot on the key —
    with the snapshot bucketed by key, only the (small) batch
    shuffles. This is the batch twin of streaming/sinks.upsert_latest.
    """
    payload = [
        c for c in base.columns if c not in key_cols
    ]
    rank = F.struct(F.col(seq_col), F.col(op_col))
    latest = changes.groupBy(*key_cols).agg(
        F.max_by(op_col, rank).alias("_op"),
        *[F.max_by(c, rank).alias(f"_c_{c}") for c in payload],
    )
    j = base.join(latest, key_cols, "full_outer")
    keep = F.col("_op").isNull() | (F.col("_op") != F.lit("D"))
    out = [
        F.when(
            F.col("_op") == F.lit("U"), F.col(f"_c_{c}")
        ).otherwise(F.col(c)).alias(c)
        for c in payload
    ]
    return j.where(keep).select(*key_cols, *out)


def skew_profile(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Join/agg-key skew diagnostics: the top-N heaviest keys with
    count, share of all rows, and skew ratio (count / mean-per-key) —
    the number you size a salt factor from before a big shuffle
    (operators/skew.salted_join picks n_salts ≈ ceil(skew_ratio)).

    Scale shape: one map-side-combinable groupBy(key) (partial counts
    combine before the shuffle, so the Exchange carries one row per
    key per task), a single-row global aggregate over the (small)
    per-key counts, broadcast back via a literal-free cross join, and
    a TakeOrdered top-N. No window over the full key set, no second
    scan of the data."""
    per_key = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    totals = per_key.agg(
        F.sum("cnt").cast("bigint").alias("total_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    from sfa_spark.operators.topk import ranked_top_k

    top = ranked_top_k(per_key, [("cnt", True), (key_col, False)], top_n)
    return top.crossJoin(F.broadcast(totals)).select(
        key_col,
        "cnt",
        "rk",
        "total_rows",
        "n_keys",
        (F.col("cnt") / F.col("total_rows")).alias("share"),
        (F.col("cnt") * F.col("n_keys") / F.col("total_rows")).alias(
            "skew_ratio"
        ),
    )
