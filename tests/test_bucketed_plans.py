"""Exchange-elision proofs for the bucketing claims the operator
docstrings make (VERDICT r5 task 6): cross_run_dedup, snapshot_diff /
apply_changes, and the TPC-H Q8 market-share big-big join each state
"bucket the join sides → the shuffle elides". These tests execute
that layout over write_bucketed fixtures and assert the plans.
Broadcast is disabled around the joins so the planner cannot sidestep
the co-location proof by broadcasting a side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfa_spark.sources.sink import write_bucketed


def _final_plan(df):
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints Final AND Initial plans — count only the final one
    cut = s.find("== Initial Plan ==")
    return s if cut < 0 else s[:cut]


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cross_run_dedup_bucketed_elides_exchanges(
    spark, tmp_path, no_broadcast
):
    """Batch and seen-index both bucketed by text_hash (the documented
    100 TB layout, hashes precomputed at ingest): the window-min over
    the batch hash AND the batch⋈index join plan with ZERO shuffle
    Exchanges."""
    from sfa_spark.operators.dedup import cross_run_dedup

    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("txt"), (F.col("id") % 80).cast("string")).alias(
            "text"
        ),
    ).withColumn("text_hash", F.md5("text"))
    batch = write_bucketed(
        docs.where("doc_id % 3 != 0"), "bkt_batch", "text_hash", 4,
        sort_cols=["text_hash"], path=str(tmp_path / "batch"),
    )
    seen = write_bucketed(
        docs.where("doc_id % 3 = 0").select("text_hash"),
        "bkt_seen", "text_hash", 4,
        sort_cols=["text_hash"], path=str(tmp_path / "seen"),
    )
    try:
        out = cross_run_dedup(batch, seen, hash_col="text_hash")
        plan = _final_plan(out)
        assert "Exchange hashpartitioning" not in plan, plan
        # sanity: same statuses as the unbucketed md5 path
        want = {
            (r["doc_id"], r["status"])
            for r in cross_run_dedup(
                docs.where("doc_id % 3 != 0"),
                docs.where("doc_id % 3 = 0").select("text_hash"),
            ).collect()
        }
        got = {(r["doc_id"], r["status"]) for r in out.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_batch")
        spark.sql("DROP TABLE IF EXISTS bkt_seen")


def test_snapshot_diff_and_apply_changes_bucketed_plans(
    spark, tmp_path, no_broadcast
):
    """snapshot_diff over two snapshots bucketed by the key: the
    full-outer join plans with ZERO Exchanges. apply_changes over a
    bucketed base: exactly ONE Exchange total — the (small) change
    batch's max_by aggregate — and none on the base side."""
    from sfa_spark.operators.audit import apply_changes, snapshot_diff

    rows = spark.range(0, 500).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    # bucket count == spark.sql.shuffle.partitions (8 in conftest):
    # a shuffling side lands on the same partition count, so the
    # planner keeps the bucketed scan instead of disabling it for a
    # partition-count mismatch — the same sizing rule a production
    # layout follows
    nb = int(spark.conf.get("spark.sql.shuffle.partitions"))
    old = write_bucketed(
        rows.where("k % 11 != 0"), "bkt_old", "k", nb,
        sort_cols=["k"], path=str(tmp_path / "old"),
    )
    new = write_bucketed(
        rows.where("k % 13 != 0").withColumn(
            "v", F.when(F.col("k") % 5 == 0, F.col("v") + 100).otherwise(
                F.col("v")
            )
        ),
        "bkt_new", "k", nb, sort_cols=["k"], path=str(tmp_path / "new"),
    )
    try:
        diff = snapshot_diff(old, new, ["k"])
        plan = _final_plan(diff)
        assert "Exchange hashpartitioning" not in plan, plan
        assert diff.count() > 0

        changes = spark.range(0, 60).select(
            (F.col("id") * 9 % 500).alias("k"),
            F.lit(1).alias("seq"),
            F.when(F.col("id") % 4 == 0, F.lit("D"))
            .otherwise(F.lit("U")).alias("op"),
            F.lit(-1.0).alias("v"),
        )
        applied = apply_changes(old, changes, ["k"])
        plan2 = _final_plan(applied)
        n_exch = plan2.count("Exchange hashpartitioning")
        assert n_exch == 1, plan2
        # the one Exchange must be on the batch subtree, i.e. the
        # bucketed base scan is NOT below any Exchange: in-plan order,
        # the scan of bkt_old appears after the last Exchange line
        # only if it wasn't shuffled; assert structurally instead —
        # removing the base from a bucketed table would add a second
        # Exchange (proven by the count above vs the unbucketed twin)
        plain = apply_changes(
            rows.where("k % 11 != 0"), changes, ["k"]
        )
        n_plain = _final_plan(plain).count("Exchange hashpartitioning")
        assert n_plain == 2, "unbucketed twin should shuffle both sides"
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_old")
        spark.sql("DROP TABLE IF EXISTS bkt_new")


def test_market_share_join_bucketed_elides_big_join_exchange(
    spark, tmp_path, no_broadcast
):
    """The q_tpch_market_share docstring's layout: lineitem and orders
    bucketed by orderkey → the one big-big join plans with NO Exchange
    on either side; the only Exchange left is the final year groupBy."""
    li = spark.range(0, 2000).select(
        (F.col("id") % 400).alias("l_orderkey"),
        (F.col("id") % 9 + 1.0).alias("l_extendedprice"),
        (F.col("id") % 3 / 100.0).alias("l_discount"),
    )
    orders = spark.range(0, 400).select(
        F.col("id").alias("o_orderkey"),
        F.to_date(
            F.concat(
                F.lit("199"), (F.col("id") % 8).cast("string"),
                F.lit("-01-0"), (F.col("id") % 9 + 1).cast("string"),
            )
        ).alias("o_orderdate"),
    )
    bli = write_bucketed(
        li, "bkt_li", "l_orderkey", 4, sort_cols=["l_orderkey"],
        path=str(tmp_path / "li"),
    )
    bord = write_bucketed(
        orders, "bkt_ord", "o_orderkey", 4, sort_cols=["o_orderkey"],
        path=str(tmp_path / "ord"),
    )
    try:
        rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        j = bli.join(
            bord, bli.l_orderkey == bord.o_orderkey
        ).select(
            F.year("o_orderdate").alias("o_year"), rev.alias("rev")
        )
        agg = j.groupBy("o_year").agg(F.sum("rev").alias("total"))
        plan = _final_plan(agg)
        assert plan.count("Exchange hashpartitioning") == 1, plan
        # the surviving Exchange is the year rollup, not the join:
        # both join inputs must be bucketed scans feeding a shuffle
        # join with no Exchange below it (r8: with
        # preferSortMergeJoin=false the planner may pick the sort-free
        # ShuffledHashJoin over the same bucketed inputs — the
        # invariant under test is the elided Exchange, not which
        # shuffle-join variant consumes the bucketing)
        import re as _re

        assert _re.search(r"SortMergeJoin|ShuffledHashJoin", plan), plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_li")
        spark.sql("DROP TABLE IF EXISTS bkt_ord")


def test_q6_shape_full_pushdown_zero_shuffle(spark, sf_dir):
    """The Q6 shape's claims are structural: every predicate reaches
    the parquet scan (PushedFilters carries the shipdate bounds, the
    discount band, and the quantity cap), the scan reads ONLY the four
    referenced columns, and the plan has no hash-partitioning Exchange
    (the single global sum is map-side combinable into one
    SinglePartition gather)."""
    from sfa_spark import queries as Q

    df = Q.q_tpch_forecast_revenue(spark, sf_dir)
    plan = _final_plan(df)
    assert "Exchange hashpartitioning" not in plan, plan
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in scan, scan
    assert "GreaterThanOrEqual(l_shipda" in scan, scan
    # column pruning: the scan's projected schema is exactly the four
    # referenced columns
    import re

    cols = re.search(r"FileScan parquet \[([^\]]*)\]", scan).group(1)
    names = {c.split("#")[0] for c in cols.split(",")}
    assert names == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"
    }, names


def test_partsupp_shapes_filter_before_pair_aggregate(spark, sf_dir):
    """Q2/Q11/Q20 shapes (r8, closing the r7 VERDICT plan/docstring
    mismatch): the region-filtered supplier set (and Q20's red-part
    set) must land BELOW the derived-partsupp pair aggregate as a
    broadcast left-semi on the fact's own key — at 100 TB the pair
    groupBy is the dominant shuffle and pre-filtering shrinks it to one
    region's share. Structural assertion: in the final plan, a
    BroadcastHashJoin ... LeftSemi appears DEEPER in the tree (higher
    line index) than the partial pair HashAggregate, i.e. the semi-join
    feeds the aggregate, not the other way around."""
    from sfa_spark import queries as Q

    for fn in (
        Q.q_tpch_min_cost_supplier,
        Q.q_tpch_important_stock,
        Q.q_tpch_excess_stock_supplier,
    ):
        lines = _final_plan(fn(spark, sf_dir)).splitlines()
        agg = [
            i
            for i, ln in enumerate(lines)
            if "HashAggregate" in ln and "l_partkey" in ln and "l_suppkey" in ln
        ]
        semi = [i for i, ln in enumerate(lines) if "LeftSemi" in ln]
        assert agg, f"{fn.__name__}: no pair aggregate over lineitem keys"
        assert semi, f"{fn.__name__}: no left-semi filter in plan"
        assert max(semi) > min(agg), (
            f"{fn.__name__}: semi-join not below the pair aggregate",
            lines,
        )
