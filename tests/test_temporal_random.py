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
