"""Temporal joins over event streams.

asof_join — "latest right row at or before each left row" per entity:
the canonical time-series enrichment join (quote-at-trade, state-at-
event, config-at-measurement). Spark has no ASOF relation, and the
naive formulation (range join + argmax) explodes to |L|·|R| candidate
pairs per entity before pruning. The scalable shape used here is the
UNION-SORT-FILL trick:

    tag left rows 1 / right rows 0 → union → ONE shuffle on the
    entity key → ONE sort by (time, tag, tiebreak) → last(payload,
    ignorenulls) over an unbounded-preceding running window fills
    every left row with the most recent right payload → filter tag=1.

Cost is a single Exchange + Sort over |L|+|R| rows — the same plan
class as sessionize — and it inherits AQE skew handling on hot
entities. Ties at equal time: the right row sorts FIRST (tag 0 < 1),
so "at or before" is inclusive, matching DuckDB's ASOF `>=`
semantics (the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    on: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left-outer as-of join: every left row, enriched with
    `right_cols` from the latest right row whose `on` ≤ the left
    row's `on` within the same `by` group (nulls when none precedes).
    The right `on` value is also emitted as `{on}{suffix}`.

    `right` should be unique per (by, on) — pre-aggregate ties (e.g.
    max_by) upstream; otherwise `tiebreak` names a right column whose
    LARGEST value wins among equal timestamps."""
    tag = F.lit(1)
    payload = [*right_cols, on]  # carry right's own time for lag calcs
    l_tagged = left.select(
        "*",
        tag.alias("_is_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    )
    left_only = [c for c in left.columns if c not in (by, on)]
    r_tagged = right.select(
        by,
        on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        F.lit(0).alias("_is_l"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    order = [F.col(on).asc(), F.col("_is_l").asc()]
    if tiebreak is not None:
        order.append(F.col(f"_r_{tiebreak}").asc_nulls_first())
    w = Window.partitionBy(by).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in payload
        ],
    )
    out_cols = [
        *left.columns,
        *[F.col(f"_f_{c}").alias(c) for c in right_cols],
        F.col(f"_f_{on}").alias(f"{on}{suffix}"),
    ]
    return filled.where(F.col("_is_l") == 1).select(*out_cols)


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    by: str,
    t: str,
    start: str,
    end: str,
    bucket_width: int,
) -> DataFrame:
    """Interval (range) join: every (event, interval) pair with
    interval.start ≤ event.t ≤ interval.end within the same `by`
    entity. Inner join; overlapping intervals yield one row per match.

    Spark plans a raw `t BETWEEN start AND end` predicate as a
    broadcast-nested-loop / cartesian over the entity — quadratic per
    hot key. The scalable shape is BUCKETIZATION: intervals explode to
    the fixed-width time buckets they cover, events map to their ONE
    bucket, and the join becomes an equi-join on (by, bucket) followed
    by the exact BETWEEN as a residual filter. Each matching pair
    meets in exactly one bucket (the event's), so no dedup pass is
    needed. Shuffle volume: |events| + Σ span/bucket_width — pick
    bucket_width near the typical interval span so intervals explode
    to O(1) buckets each.

    `bucket_width` shares `t`'s unit (engine convention: bigint ns)."""
    # integer `div` (not floor of a double quotient): ns-scale bigints
    # exceed the double mantissa, and a ±256 ns bucket error near a
    # boundary could make an in-interval event miss every bucket the
    # interval exploded to (timestamps are non-negative, so truncating
    # div == floor div)
    w = int(bucket_width)
    ev = events.withColumn("_bkt", F.expr(f"`{t}` div {w}").cast("long"))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"`{start}` div {w}").cast("long"),
                F.expr(f"`{end}` div {w}").cast("long"),
            )
        ),
    )
    return (
        ev.join(iv, [by, "_bkt"])
        .where(F.col(t).between(F.col(start), F.col(end)))
        .drop("_bkt")
    )


def retention(
    events: DataFrame,
    by: str,
    t: str,
    period: int,
) -> DataFrame:
    """Cohort retention: bucket activity into fixed `period`-width time
    buckets (same unit as `t`; engine convention bigint ns), cohort
    each entity by its FIRST active bucket, and count, for every
    (cohort, offset) cell, the entities active `offset` periods after
    their cohort bucket — the classic triangle retention matrix.
    n_active at offset 0 is the cohort size, so retention rate is
    n_active / first(n_active) per cohort row-wise downstream.

    Shape: ONE wide shuffle — groupBy(entity) with collect_set of the
    (small, bounded) distinct period set; map-side partial aggregation
    dedups each entity's periods before the exchange, so shuffle
    volume is ~|entities| × |distinct periods per entity|, not
    |events|. The explode + (cohort, offset) re-agg shuffles only the
    already-tiny cells. Skewed hot users cost nothing extra: their
    period set is bounded by the calendar, not their event count."""
    # integer `div`, not `/`: double division of ~1.7e18 ns loses the
    # low bits (53-bit mantissa) and can shift a bucket boundary by a
    # few hundred ns — the oracle's // is exact (t is non-negative, so
    # truncating div == floor div)
    p = F.expr(f"`{t}` div {int(period)}").cast("long")
    per_entity = events.groupBy(F.col(by)).agg(
        F.collect_set(p).alias("_ps")
    )
    cells = per_entity.select(
        F.array_min("_ps").alias("cohort"),
        F.explode("_ps").alias("_p"),
    )
    return cells.groupBy(
        "cohort",
        (F.col("_p") - F.col("cohort")).cast("int").alias("day_offset"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))


def funnel(
    events: DataFrame,
    by: str,
    t: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel analysis: for each `by` entity, the earliest
    completion time of every prefix of `steps` where step k must occur
    AT OR AFTER the chosen occurrence of step k−1 (the standard
    event-analytics conversion funnel; greedy earliest-completion is
    optimal — taking the earliest valid occurrence of each step never
    excludes a deeper prefix).

    Output: (by, stage, step_ts) — one row per COMPLETED stage
    (1-based), so max(stage) per entity is its funnel depth and
    count(stage = k) / count(stage = 1) is the step-k conversion rate.

    Shape: one shuffle on the entity key; per entity the greedy scan
    is a sorted aggregate over ONLY that entity's step events
    (min-of-filtered chain, computed as k running conditional minima
    in one sort order). Implemented as k chained conditional window
    minima — no join, no explode."""
    d = events.where(F.col(type_col).isin(list(steps))).select(
        by, F.col(t).alias("_t"), F.col(type_col).alias("_ty")
    )
    # tie-break equal timestamps by step order (earlier steps first) so
    # a same-instant chain s_{k-1}, s_k still completes — the running
    # minima below then see reach_{k-1} before evaluating step k
    rank = F.lit(None).cast("int")
    for i, s in reversed(list(enumerate(steps))):
        rank = F.when(F.col("_ty") == F.lit(s), F.lit(i)).otherwise(rank)
    d = d.withColumn("_rank", rank)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col("_t").asc(), F.col("_rank").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # running earliest completion time of each prefix: reach_k at a row
    # = min over rows ≤ current of (this row is step k AND reach_{k-1}
    # already achieved at an earlier-or-equal time)
    prev = None
    for k, s in enumerate(steps):
        cond = F.col("_ty") == F.lit(s)
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (F.col(prev) <= F.col("_t"))
        col = f"_reach{k}"
        d = d.withColumn(col, F.min(F.when(cond, F.col("_t"))).over(w))
        prev = col
    agg = d.groupBy(by).agg(
        *[F.min(f"_reach{k}").alias(f"_s{k}") for k in range(len(steps))]
    )
    stages = agg.select(
        by,
        F.posexplode(F.array(*[F.col(f"_s{k}") for k in range(len(steps))])).alias(
            "_k", "step_ts"
        ),
    )
    return stages.where(F.col("step_ts").isNotNull()).select(
        by, (F.col("_k") + 1).cast("int").alias("stage"), "step_ts"
    )


def zscore_outliers(
    events: DataFrame,
    by: str,
    value: str,
    z: float = 3.0,
) -> DataFrame:
    """Group-wise z-score anomaly flagging: an event is an outlier if
    its value is more than `z` population standard deviations from its
    group's mean — the monitoring pass a pipeline runs over metric
    streams before training-data cuts.

    Shape: one aggregation shuffle for the tiny (group, mean, std)
    table, broadcast back over the events — the corpus itself is never
    re-shuffled (unlike the window-function formulation, which would
    sort every group). Degenerate groups (std = 0) produce no
    outliers."""
    stats = events.groupBy(by).agg(
        F.avg(value).alias("_mu"),
        F.stddev_pop(value).alias("_sd"),
    )
    scored = events.join(F.broadcast(stats), by).where(F.col("_sd") > 0)
    zcol = (F.col(value) - F.col("_mu")) / F.col("_sd")
    return scored.where(F.abs(zcol) > F.lit(z)).select(
        *events.columns, zcol.alias("zscore")
    )


def scd2_history(
    changelog: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an append
    changelog: every version of every key gets a validity interval
    [valid_from, valid_to) — valid_to is the NEXT version's timestamp
    (NULL while current) — plus a version number and an is_current
    flag. The companion of the latest-state compaction
    (queries.q_latest_state): that keeps only the newest row, this
    keeps them all, queryable as-of any time via
    `valid_from <= t AND (valid_to IS NULL OR t < valid_to)`.

    One shuffle on the key; the lag/lead pass is a single sorted
    window over each key's own versions (bounded by versions-per-key,
    not stream length). At 100 TB this is the standard dimension-
    history build before an as-of join (asof_join above consumes it).
    """
    ob = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*ob)
    ts0 = order_cols[0]
    return (
        changelog.withColumn("version", F.row_number().over(w).cast("int"))
        .withColumn("valid_from", F.col(ts0))
        .withColumn("valid_to", F.lead(ts0).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_apply(
    history: DataFrame,
    batch: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Incremental SCD2 maintenance: fold a NEW changelog batch into an
    existing scd2_history table WITHOUT rebuilding it — the nightly
    production shape (scd2_history is the from-scratch build; this is
    its MERGE). Batch rows must sort strictly after each key's current
    version (CDC deltas do) — and since r7 that precondition is
    STRUCTURAL, not documentation: an in-plan assert_true on the
    close join aborts the whole plan if any affected key's first batch
    row does not sort strictly after the key's open row (a
    late-arriving CDC row would otherwise silently produce overlapping
    valid_from/valid_to intervals). The guard rides the join the close
    step already does — no extra shuffle.

    Per affected key: the open (is_current) row closes at the batch's
    first timestamp for that key; batch rows become new versions that
    continue the key's version numbering and chain validity among
    themselves; unaffected keys and already-closed rows PASS THROUGH
    untouched. apply(history(prefix), batch(suffix)) ==
    scd2_history(prefix ∪ suffix) exactly (property-tested).

    Scale shape, O(delta): the pass-through/close fold is ONE scan of
    history left-joined against the batch's delta-sized firsts
    table with a lazy per-row CASE (r9 — the previous shape was a
    3-subtree union: close join + anti-join + non-current filter, each
    re-scanning history, i.e. 3× the history I/O per merge and two
    extra AQE stage jobs per streaming micro-batch); the base-version
    lookup is a second, column-pruned scan of the current rows only.
    The window sort runs over the BATCH only. With history bucketed by
    the key, the single key join keeps the bucketed partitioning (the
    apply_changes layout, tests/test_bucketed_plans.py)."""
    ts0 = order_cols[0]
    ob = [F.col(c).asc() for c in order_cols]
    firsts = batch.groupBy(key_col).agg(
        F.min(F.struct(*order_cols)).alias("_first")
    )
    base = (
        history.where(F.col("is_current"))
        .select(key_col, F.col("version").alias("_base_v"))
    )
    # one history pass: rows of keys the batch touches whose version is
    # open get closed at the batch's arrival, everything else passes
    # through unchanged. The ordering guard rides the same rows —
    # CASE WHEN evaluates lazily, so assert_true runs exactly on the
    # affected open rows (as the old close-join filter did): it is NULL
    # (row passes) while the precondition holds and aborts the job
    # with a named error the moment it doesn't.
    affected_open = F.col("is_current") & F.col("_first").isNotNull()
    guard = F.when(
        affected_open,
        F.assert_true(
            F.col("_first") > F.struct(*order_cols),
            F.concat(
                F.lit(
                    "scd2_apply: out-of-order batch — key "
                ),
                F.col(key_col).cast("string"),
                F.lit(
                    "'s first batch row does not sort strictly after its "
                    "open (is_current) version; a late CDC row would "
                    "create overlapping validity intervals. Re-slice the "
                    "feed in (ts, event_id) order or rebuild with "
                    "scd2_history."
                ),
            ),
        ).isNull(),
    ).otherwise(F.lit(True))
    hist_out = (
        history.join(firsts, key_col, "left")
        .where(guard)
        .withColumn(
            "valid_to",
            F.when(affected_open, F.col(f"_first.{ts0}")).otherwise(
                F.col("valid_to")
            ),
        )
        .withColumn(
            "is_current",
            F.when(affected_open, F.lit(False)).otherwise(
                F.col("is_current")
            ),
        )
        .drop("_first")
    )
    w = Window.partitionBy(key_col).orderBy(*ob)
    new_rows = (
        batch.join(base, key_col, "left")
        .withColumn(
            "version",
            (
                F.row_number().over(w) + F.coalesce("_base_v", F.lit(0))
            ).cast("int"),
        )
        .withColumn("valid_from", F.col(ts0))
        .withColumn("valid_to", F.lead(ts0).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_base_v")
    )
    cols = [
        c for c in history.columns
    ]
    return hist_out.select(*cols).unionByName(new_rows.select(*cols))


def pattern_detect(
    events: DataFrame,
    start: str,
    then: str,
    without: str | None = None,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern over an event log:
    every `start` event matched to the NEXT `then` event of the same
    entity, optionally requiring NO `without` event strictly between
    them (the negative condition funnels cannot express — e.g.
    "click then purchase with no error in between").

    One keyed shuffle; the 'next then' and 'next without' timestamps
    are two conditional minima over the SAME sorted window spec, so
    Catalyst plans one Exchange + one Sort + WindowExec passes — no
    self-join, no explode. A `without` tied to the exact instant of
    the `then` event does NOT block the match (strictly-between
    semantics; the oracle mirrors the same `<`).

    Output: (entity, start_ts, start_id, then_ts, then_id).
    """
    ob = [F.col(c).asc() for c in order_cols]
    w = (
        Window.partitionBy(entity_col)
        .orderBy(*ob)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ts0, id0 = order_cols[0], order_cols[1]
    nxt = F.min(
        F.when(
            F.col(type_col) == then, F.struct(F.col(ts0), F.col(id0))
        )
    ).over(w)
    blk = F.min(
        F.when(
            F.col(type_col) == without, F.struct(F.col(ts0), F.col(id0))
        )
    ).over(w) if without else F.lit(None)
    d = (
        events.withColumn("_nxt", nxt)
        .withColumn("_blk", blk)
        .where(F.col(type_col) == start)
        .where(F.col("_nxt").isNotNull())
    )
    if without:
        d = d.where(
            F.col("_blk").isNull()
            | (F.col("_blk")[ts0] >= F.col("_nxt")[ts0])
        )
    return d.select(
        entity_col,
        F.col(ts0).alias("start_ts"),
        F.col(id0).alias("start_id"),
        F.col("_nxt")[ts0].alias("then_ts"),
        F.col("_nxt")[id0].alias("then_id"),
    )


def mad_outliers(
    events: DataFrame,
    by: str = "event_type",
    value: str = "value",
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier flagging by median absolute deviation: flag rows
    with |v − median| > k · 1.4826 · MAD per group. Unlike the z-score
    variant (zscore_outliers above), the cutoff itself is immune to
    the outliers it hunts — one extreme row cannot widen its own gate
    (the classic breakdown failure of mean/σ).

    Two exact-median aggregation passes (Spark `percentile` ==
    DuckDB `quantile_cont` to the ulp — same bridge q_latency_quantiles
    certifies) with the group stats broadcast back; the corpus is
    filtered in place, never re-shuffled. Groups are category-sized
    (event types, domains), so the per-group exact median is a bounded
    sort within the aggregate."""
    med = events.groupBy(by).agg(
        F.expr(f"percentile({value}, 0.5)").alias("_med")
    )
    j1 = events.join(F.broadcast(med), by)
    mad = j1.groupBy(by).agg(
        F.expr(f"percentile(abs({value} - _med), 0.5)").alias("_mad"),
        F.first("_med").alias("_med2"),
    )
    scored = events.join(F.broadcast(mad), by).where(F.col("_mad") > 0)
    dev = F.abs(F.col(value) - F.col("_med2"))
    return (
        scored.where(dev > F.lit(k * 1.4826) * F.col("_mad"))
        .select(
            *events.columns,
            (dev / (F.lit(1.4826) * F.col("_mad"))).alias("mad_score"),
        )
    )


def winsorize(
    events: DataFrame,
    by: str = "event_type",
    value: str = "value",
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Percentile clipping (winsorization) per group: values below the
    group's p_lo quantile clamp up to it, values above p_hi clamp down
    — the standard tail-taming pass before scaling/featurizing, kept
    exact so the oracle can be exact too.

    One exact-quantile aggregate per group (Spark `percentile` ==
    DuckDB `quantile_cont`, the certified bridge), bounds broadcast
    back, clip row-local. Adds `clipped` so downstream can count the
    affected tail without a second pass."""
    q = events.groupBy(by).agg(
        F.expr(f"percentile({value}, {float(p_lo)})").alias("_q_lo"),
        F.expr(f"percentile({value}, {float(p_hi)})").alias("_q_hi"),
    )
    j = events.join(F.broadcast(q), by)
    v = F.col(value)
    # Spark's greatest/least SKIP NULL args, so a NULL value would
    # silently fabricate value_w = the group's p_lo quantile. Keep
    # NULL in → NULL out (value_w and clipped both NULL), matching
    # the oracle's CASE WHEN value IS NULL THEN NULL.
    clipped_v = F.when(v.isNull(), F.lit(None)).otherwise(
        F.least(F.greatest(v, F.col("_q_lo")), F.col("_q_hi"))
    )
    return j.select(
        *[c for c in events.columns],
        clipped_v.alias(f"{value}_w"),
        (v != clipped_v).cast("int").cast("bigint").alias("clipped"),
    )


def merge_aggregates(
    prior: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental maintenance of a SUM/COUNT-shaped materialized
    aggregate: fold a (small) delta batch into the prior aggregate
    WITHOUT rescanning history — union the prior rows with the delta's
    partial aggregate and re-sum per key. Correct for any commutative
    monoid column (sums, counts, bit_or sketches…); min/max work for
    inserts-only; averages must be stored as (sum, count) pairs.

    Scale shape: history is touched only through its (group-sized)
    aggregate; the delta aggregates map-side before the union; one
    groupBy on the key — the 100 TB rule that a nightly refresh costs
    O(delta), not O(corpus)."""
    d = delta.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
    return (
        prior.select(*keys, *sum_cols)
        .unionByName(d.select(*keys, *sum_cols))
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
