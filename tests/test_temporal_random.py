"""Randomized brute-force cross-checks for the temporal joins: the
Spark operators must equal a direct per-entity python evaluation on
adversarial random data (timestamp ties, empty sides, hot entities)."""

import numpy as np

from sfa_spark.operators.temporal import asof_join, funnel, interval_join


def _rng_events(rng, n_entities, n, t_max, ties=True):
    ts = rng.integers(0, t_max, size=n)
    if ties:  # force collisions so tie semantics are exercised
        ts = (ts // 7) * 7
    return [
        (int(rng.integers(0, n_entities)), int(t), float(i))
        for i, t in enumerate(ts)
    ]


def test_asof_join_random_vs_bruteforce(spark):
    rng = np.random.default_rng(42)
    left = _rng_events(rng, 5, 120, 1000)
    right = _rng_events(rng, 5, 80, 1000)
    # operator contract: right unique per (by, on) — keep max value
    rmap = {}
    for u, t, v in right:
        rmap[(u, t)] = max(rmap.get((u, t), -1e18), v)
    right = [(u, t, v) for (u, t), v in rmap.items()]

    ldf = spark.createDataFrame(left, "uid long, t long, lv double")
    rdf = spark.createDataFrame(right, "uid long, t long, v double")
    got = {
        (r["uid"], r["t"], r["lv"]): (r["v"], r["t_right"])
        for r in asof_join(ldf, rdf, by="uid", on="t", right_cols=["v"]).collect()
    }
    assert len(got) == len({(u, t, lv) for u, t, lv in left})
    for u, t, lv in left:
        cand = [(rt, v) for (ru, rt, v) in right if ru == u and rt <= t]
        want = max(cand) if cand else None  # latest rt (inclusive)
        if want is None:
            assert got[(u, t, lv)] == (None, None)
        else:
            assert got[(u, t, lv)] == (want[1], want[0]), (u, t, want)


def test_interval_join_random_vs_bruteforce(spark):
    rng = np.random.default_rng(43)
    evs = _rng_events(rng, 4, 100, 500)
    ivs = []
    for i in range(40):
        s = int(rng.integers(0, 500))
        ivs.append((int(rng.integers(0, 4)), i, s, s + int(rng.integers(0, 90))))
    edf = spark.createDataFrame(evs, "uid long, t long, ev double")
    idf = spark.createDataFrame(ivs, "uid long, iid long, s long, e long")
    got = {
        (r["uid"], r["t"], r["ev"], r["iid"])
        for r in interval_join(
            edf, idf, by="uid", t="t", start="s", end="e", bucket_width=64
        ).collect()
    }
    want = {
        (u, t, ev, iid)
        for (u, t, ev) in evs
        for (iu, iid, s, e) in ivs
        if iu == u and s <= t <= e
    }
    assert got == want and len(want) > 0


def test_funnel_random_vs_bruteforce(spark):
    rng = np.random.default_rng(44)
    steps = ["a", "b", "c"]
    rows = []
    for i in range(300):
        rows.append(
            (
                int(rng.integers(0, 25)),
                int((rng.integers(0, 400) // 5) * 5),  # many ties
                str(rng.choice(["a", "b", "c", "x"])),
            )
        )
    df = spark.createDataFrame(rows, "uid long, t long, ty string")
    got = {
        (r["uid"], r["stage"]): r["step_ts"]
        for r in funnel(df, by="uid", t="t", type_col="ty", steps=steps).collect()
    }
    # greedy earliest-completion chain, step k at-or-after step k-1
    want = {}
    for u in {r[0] for r in rows}:
        mine = [(t, ty) for (uu, t, ty) in rows if uu == u]
        reach = None
        for k, s in enumerate(steps):
            cand = [t for (t, ty) in mine if ty == s and (reach is None or t >= reach)]
            if not cand:
                break
            reach = min(cand)
            want[(u, k + 1)] = reach
    assert got == want and len(want) > 0


def test_scd2_asof_reconstruction_matches_prefix_latest(spark):
    """For random as-of probe times, the SCD2 interval lookup
    (valid_from <= t < valid_to) returns exactly the latest changelog
    row at or before t — the defining property of a type-2 history."""
    import random

    from pyspark.sql import functions as F

    from sfa_spark.operators.temporal import scd2_history

    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(6):
        for _ in range(rng.randint(1, 8)):
            rows.append((eid, rng.randint(0, 1000), u, f"s{rng.randint(0,3)}", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    hist = scd2_history(ev).collect()
    data = sorted(
        [(r["user_id"], r["ts"], r["event_id"], r["event_type"]) for r in ev.collect()]
    )
    for t in [0, 100, 437, 999, 1001]:
        asof = {
            r["user_id"]: r["event_id"]
            for r in hist
            if r["valid_from"] <= t
            and (r["valid_to"] is None or t < r["valid_to"])
        }
        for u in range(6):
            prefix = [x for x in data if x[0] == u and x[1] <= t]
            want = max(prefix, key=lambda x: (x[1], x[2]))[2] if prefix else None
            assert asof.get(u) == want, (u, t)
    # intervals tile: per user, version k's valid_to == version k+1's valid_from
    by_user = {}
    for r in hist:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, vs in by_user.items():
        vs.sort(key=lambda r: r["version"])
        assert vs[-1]["is_current"] and vs[-1]["valid_to"] is None
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"]


def test_twap_hand_computed_and_cooccurrence_lift(spark, tmp_path):
    """TWAP weights each value by its holding time (last event carries
    none); co-occurrence lift is support·N/(cnt_a·cnt_b)."""
    import sfa_spark.queries as Q

    ev = spark.createDataFrame(
        [
            (1, 0, 7, "a", 10.0),
            (2, 10_000_000_000, 7, "b", 20.0),
            (3, 30_000_000_000, 7, "a", 99.0),  # terminal: no weight
            (4, 0, 8, "a", 5.0),
            (5, 5_000_000_000, 8, "c", 5.0),
        ],
        "event_id long, ts long, user_id long, event_type string, value double",
    )
    sf = str(tmp_path)
    ev.write.parquet(f"{sf}/events.parquet")
    twap = {r["user_id"]: r["twap"] for r in Q.q_twap(spark, sf).collect()}
    # user 7: (10·10 + 20·20) / 30 = 16.6667 ; user 8: 5·5/5 = 5
    assert twap == {7: 16.6667, 8: 5.0}
    co = {
        (r["type_a"], r["type_b"]): (r["support"], r["lift"])
        for r in Q.q_event_cooccurrence(spark, sf).collect()
    }
    # 2 users; a∩b in 1 of them, cnt_a=2, cnt_b=1 → lift = 1·2/(2·1)=1
    assert co[("a", "b")] == (1, 1.0)
    assert co[("a", "c")] == (1, 1.0)
    assert ("b", "c") not in co  # never co-occur


def test_pattern_detect_negative_condition_semantics(spark):
    """click→purchase with no error between: an error strictly between
    blocks the match; errors before the click, after the purchase, or
    tied to the purchase instant do not."""
    from sfa_spark.operators.temporal import pattern_detect

    rows = [
        # user 1: click(10) → error(20) → purchase(30): BLOCKED
        (1, 10, 1, "click"), (2, 20, 1, "error"), (3, 30, 1, "purchase"),
        # user 2: error(5) → click(10) → purchase(30): matches
        (4, 5, 2, "error"), (5, 10, 2, "click"), (6, 30, 2, "purchase"),
        # user 3: click(10) → purchase(30) tied with error(30): matches
        (7, 10, 3, "click"), (8, 30, 3, "error"), (9, 30, 3, "purchase"),
        # user 4: click with no purchase at all: no row
        (10, 10, 4, "click"), (11, 20, 4, "error"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string"
    )
    got = {
        r["user_id"]: (r["start_ts"], r["then_ts"])
        for r in pattern_detect(
            ev, start="click", then="purchase", without="error"
        ).collect()
    }
    assert got == {2: (10, 30), 3: (10, 30)}
    # brute cross-check on random logs: for each click, scan forward
    import random

    rng = random.Random(3)
    rows2, eid = [], 0
    for u in range(8):
        t = 0
        for _ in range(rng.randint(3, 14)):
            t += rng.randint(1, 5)
            rows2.append((eid, t, u, rng.choice(["click", "purchase", "error", "view"])))
            eid += 1
    ev2 = spark.createDataFrame(
        rows2, "event_id long, ts long, user_id long, event_type string"
    )
    got2 = {
        (r["user_id"], r["start_id"]): r["then_id"]
        for r in pattern_detect(
            ev2, start="click", then="purchase", without="error"
        ).collect()
    }
    want = {}
    by_user = {}
    for e in rows2:
        by_user.setdefault(e[2], []).append(e)
    for u, es in by_user.items():
        es.sort(key=lambda e: (e[1], e[0]))
        for i, e in enumerate(es):
            if e[3] != "click":
                continue
            nxt = next(((j, f) for j, f in enumerate(es[i + 1:], i + 1) if f[3] == "purchase"), None)
            if nxt is None:
                continue
            j, p = nxt
            blocked = any(
                f[3] == "error" and f[1] < p[1] for f in es[i + 1:j]
            )
            if not blocked:
                want[(u, e[0])] = p[0]
    assert got2 == want


def test_mad_outliers_breakdown_resistant(spark):
    """MAD's defining property vs z-scores: a massive outlier cannot
    widen its own cutoff. One 1000.0 among values ~N(10, 1) is flagged
    by MAD; the same row drags the stddev enough that a 3σ z-score
    misses moderate secondary outliers MAD still catches."""
    from sfa_spark.operators.temporal import mad_outliers, zscore_outliers

    vals = [10.0, 9.5, 10.5, 9.8, 10.2, 9.9, 10.1, 10.3, 9.7, 10.0,
            18.0,      # moderate outlier
            1000.0]    # extreme outlier
    ev = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    mad_ids = {
        r["event_id"]
        for r in mad_outliers(ev, by="event_type", k=3.0).collect()
    }
    assert {10, 11} <= mad_ids  # both outliers flagged
    assert not mad_ids & set(range(10))  # inliers untouched
    z_ids = {
        r["event_id"]
        for r in zscore_outliers(
            ev, by="event_type", value="value", z=3.0
        ).collect()
    }
    assert 10 not in z_ids  # σ blown up by the 1000 → 18 slips through


def test_winsorize_clamps_tails_only(spark):
    from sfa_spark.operators.temporal import winsorize

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 100)] + [("a", 1000.0)],
        "event_type string, value double",
    )
    w = {r["value"]: (r["value_w"], r["clipped"]) for r in
         winsorize(df, p_lo=0.05, p_hi=0.95).collect()}
    assert w[1000.0][1] == 1 and w[1000.0][0] < 1000.0  # tail clamped
    assert w[50.0] == (50.0, 0)                          # body untouched


def test_winsorize_null_value_stays_null(spark):
    """A NULL value must NOT fabricate data: Spark greatest/least skip
    NULL args, so without the guard a NULL row would come back as the
    group's p_lo quantile. NULL in → value_w NULL, clipped NULL."""
    from sfa_spark.operators.temporal import winsorize

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 100)] + [("a", None)],
        "event_type string, value double",
    )
    rows = winsorize(df, p_lo=0.05, p_hi=0.95).collect()
    null_rows = [r for r in rows if r["value"] is None]
    assert len(null_rows) == 1
    assert null_rows[0]["value_w"] is None
    assert null_rows[0]["clipped"] is None
    # non-null rows unaffected by the guard
    assert all(r["value_w"] is not None for r in rows if r["value"] is not None)


def test_merge_aggregates_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from sfa_spark.operators.temporal import merge_aggregates

    full = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 5), ("b", 2, 7), ("a", 3, 1), ("c", 1, 2)],
        "k string, u long, v long",
    )
    hist, delta = full.where("u != 1"), full.where("u = 1")
    prior = hist.groupBy("k", "u").agg(
        F.sum("v").alias("v"), F.count(F.lit(1)).alias("n")
    )
    d2 = delta.withColumn("n", F.lit(1).cast("bigint"))
    merged = merge_aggregates(prior, d2, ["k", "u"], ["v", "n"])
    want = {
        (r["k"], r["u"]): (r["v"], r["n"])
        for r in full.groupBy("k", "u")
        .agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r["k"], r["u"]): (r["v"], r["n"]) for r in merged.collect()}
    assert got == want


def test_scd2_apply_equals_rebuild(spark):
    """Property: folding any suffix batch into the prefix's history
    reproduces the from-scratch history exactly — versions, validity
    chain, is_current, pass-through of untouched keys."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sfa_spark.operators.temporal import scd2_apply, scd2_history

    rng = random.Random(13)
    rows = []
    eid = 0
    for u in range(12):
        for _ in range(rng.randint(1, 9)):
            rows.append((eid, u, rng.choice("abc"), rng.randint(1, 500), float(rng.randint(0, 99))))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long, value double"
    )
    for cut in (1, 2, 4):
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_cnt", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
        )
        prefix = ranked.where(F.col("_rn") <= F.col("_cnt") - cut).drop("_rn", "_cnt")
        batch = ranked.where(F.col("_rn") > F.col("_cnt") - cut).drop("_rn", "_cnt")
        got = {
            (r["user_id"], r["event_id"]): (
                r["version"], r["valid_from"], r["valid_to"], r["is_current"]
            )
            for r in scd2_apply(scd2_history(prefix), batch).collect()
        }
        want = {
            (r["user_id"], r["event_id"]): (
                r["version"], r["valid_from"], r["valid_to"], r["is_current"]
            )
            for r in scd2_history(df).collect()
        }
        assert got == want, f"cut={cut}"


def test_scd2_apply_ordering_guard(spark):
    """The r7 structural precondition (VERDICT r6 task 4): a batch row
    that does NOT sort strictly after its key's open version aborts the
    plan in-flight (hot); an in-order batch — including a same-ts row
    that wins only on the event_id tiebreak — passes untouched (cool)."""
    import pytest
    from pyspark.sql import functions as F

    from sfa_spark.operators.temporal import scd2_apply, scd2_history

    schema = (
        "event_id long, user_id long, event_type string, ts long, "
        "value double"
    )
    hist = scd2_history(
        spark.createDataFrame(
            [(0, 1, "a", 100, 1.0), (5, 2, "a", 10, 0.5)], schema
        )
    )

    # hot: late CDC row (ts 50 < open row's ts 100) → named abort
    late = spark.createDataFrame([(9, 1, "b", 50, 2.0)], schema)
    with pytest.raises(Exception, match="out-of-order batch"):
        scd2_apply(hist, late).collect()

    # hot: exact tie on (ts, event_id) is NOT strictly after → abort
    tie = spark.createDataFrame([(0, 1, "b", 100, 2.0)], schema)
    with pytest.raises(Exception, match="out-of-order batch"):
        scd2_apply(hist, tie).collect()

    # cool: same ts but larger event_id sorts strictly after → passes,
    # and untouched key 2 flows through as-is
    ok = spark.createDataFrame([(7, 1, "b", 100, 2.0)], schema)
    out = scd2_apply(hist, ok)
    got = {
        (r["user_id"], r["event_id"]): (r["version"], r["is_current"])
        for r in out.collect()
    }
    assert got == {(1, 0): (1, False), (1, 7): (2, True), (2, 5): (1, True)}
    closed = out.where((F.col("user_id") == 1) & (F.col("event_id") == 0)).first()
    assert closed["valid_to"] == 100
