"""Index vs brute force — the reference SFATrieTest invariant: indexed
k-NN distances equal linear-scan distances exactly."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from sfa_spark.plans.index import SFAIndex


def _znorm_rows(mat):
    m = mat - mat.mean(axis=1, keepdims=True)
    return m / m.std(axis=1, keepdims=True)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(21)
    walks = np.cumsum(rng.normal(0, 1, (120, 64)), axis=1)
    Z = _znorm_rows(walks)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(Z)],
        "series_id long, values array<double>",
    ).cache()
    return df, Z


def test_knn_equals_bruteforce(spark, corpus, tmp_path):
    df, Z = corpus
    idx = SFAIndex.build(
        df, str(tmp_path / "idx"), word_length=8, alphabet=8, prefix_len=2
    )
    queries = df.where(F.col("series_id") < 5)
    res = idx.knn(queries, k=3).collect()
    # brute force in numpy
    D = np.sqrt(((Z[:, None, :] - Z[None, :, :]) ** 2).sum(-1))
    got = {(r["q_id"], r["rk"]): (r["nn_id"], r["dist"]) for r in res}
    for qi in range(5):
        order = np.lexsort((np.arange(len(Z)), D[qi]))
        for rk in range(1, 4):
            nn, dist = got[(qi, rk)]
            assert dist == pytest.approx(D[qi, order[rk - 1]], abs=1e-9)
            assert nn == order[rk - 1]


def test_knn_self_is_rank1(spark, corpus, tmp_path):
    df, Z = corpus
    idx = SFAIndex.build(df, str(tmp_path / "idx2"), word_length=8, alphabet=8, prefix_len=1)
    res = idx.knn(df.where("series_id < 3"), k=1).collect()
    for r in res:
        assert r["nn_id"] == r["q_id"] and r["dist"] == pytest.approx(0.0, abs=1e-9)


def test_range_search_equals_bruteforce(spark, corpus, tmp_path):
    df, Z = corpus
    idx = SFAIndex.build(df, str(tmp_path / "idx3"), word_length=8, alphabet=8, prefix_len=2)
    eps = float(np.quantile(np.sqrt(((Z[0] - Z[1:]) ** 2).sum(-1)), 0.1))
    res = idx.range_search(df.where("series_id < 4"), epsilon=eps).collect()
    got = {(r["q_id"], r["nn_id"]) for r in res}
    D = np.sqrt(((Z[:, None, :] - Z[None, :, :]) ** 2).sum(-1))
    expected = {(qi, ci) for qi in range(4) for ci in range(len(Z)) if D[qi, ci] <= eps}
    assert got == expected


def test_summary_prunes(spark, corpus, tmp_path):
    """The box-LB must prune at least some prefixes for a tight query
    (sanity that the two-phase plan isn't a disguised full scan)."""
    df, Z = corpus
    path = str(tmp_path / "idx4")
    idx = SFAIndex.build(df, path, word_length=8, alphabet=8, prefix_len=2)
    n_prefixes = spark.read.parquet(f"{path}/summary").count()
    assert n_prefixes > 4  # corpus spreads over several buckets


def test_subsequence_index_finds_planted_motif(spark, tmp_path):
    """Plant a motif twice in a long series; querying with the motif
    must return both occurrences (reference subsequence matching)."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(41)
    w = 32
    motif = np.sin(np.linspace(0, 4 * np.pi, w))
    series = rng.normal(0, 1, 400)
    series[50 : 50 + w] = motif
    series[300 : 300 + w] = motif
    long_df = spark.createDataFrame(
        [(0, i, float(v), 400) for i, v in enumerate(series)],
        "series_id long, pos long, value double, n long",
    )
    idx = SFAIndex.build_subsequence(
        long_df, window=w, path=str(tmp_path / "sub"), word_length=8,
        alphabet=8, prefix_len=1,
    )
    zm = (motif - motif.mean()) / motif.std()
    q = spark.createDataFrame(
        [(999, zm.tolist())], "series_id long, values array<double>"
    )
    res = idx.knn(q, k=2).collect()
    offsets = sorted(r["nn_id"] % (1 << 32) for r in res)
    assert offsets == [50, 300]
    assert all(r["dist"] < 1e-6 for r in res)


def test_subsequence_window_rows_chunked_matches_numpy(spark):
    """The chunked Arrow window materialization must produce exactly
    one row per sliding window (no w× amplification), with per-window
    z-normalized values matching numpy, across chunk boundaries (small
    chunk_size forces multi-chunk), and plan WITHOUT an explode."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    w, cs = 16, 40
    lengths = {7: 100, 8: 41, 9: 15}  # multi-chunk, chunk+tail, too short
    rows = []
    expect = {}
    for sid, n in lengths.items():
        x = rng.normal(0, 1, n)
        rows += [(sid, i, float(v), n) for i, v in enumerate(x)]
        if n >= w:
            for s in range(n - w + 1):
                win = x[s : s + w]
                std = win.std()
                z = (win - win.mean()) / (std if std > 0 else 1.0)
                expect[sid * (1 << 32) + s] = z
    long_df = spark.createDataFrame(
        rows, "series_id long, pos long, value double, n long"
    )
    out = SFAIndex._subsequence_window_rows(long_df, w, chunk_size=cs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan  # no explode anywhere
    got = {r["series_id"]: np.asarray(r["values"]) for r in out.collect()}
    assert set(got) == set(expect)  # exactly n-w+1 rows per series
    for k, z in expect.items():
        assert np.allclose(got[k], z, atol=1e-9), k


def test_sfa_lb_distance_property(spark, corpus, tmp_path):
    """SFAMinDistanceTest twin: the word-level SFA lower bound is ≤ the
    true Euclidean distance for every (query, candidate) pair."""
    import numpy as np

    from sfa_spark.functions.distances import sfa_lb_distance
    from sfa_spark.operators import sfa as SFA

    df, Z = corpus
    sub = df.where("series_id < 30")
    model = SFA.fit_whole(sub, word_length=8, alphabet=8)
    tl = SFA.transform_whole_long(model, sub).collect()
    bins = {r["seg"]: list(r["bins"]) for r in model.bins.collect()}
    dfts, syms = {}, {}
    for r in tl:
        dfts.setdefault(r["series_id"], {})[r["seg"]] = r["coef"]
        syms.setdefault(r["series_id"], {})[r["seg"]] = r["symbol"]
    ids = sorted(dfts)
    for qi in ids[:10]:
        q = [dfts[qi][i] for i in range(8)]
        for ci in ids:
            lb = sfa_lb_distance(q, [syms[ci][i] for i in range(8)], bins)
            ed = float(np.sqrt(((Z[qi] - Z[ci]) ** 2).sum()))
            assert lb <= ed + 1e-6, (qi, ci, lb, ed)


def test_prefix_depth_invariance(spark, corpus, tmp_path):
    """SFABulkLoadTest twin: the index must answer identically no
    matter how the build partitioned it (prefix depth 1 vs 2 ≈ bulk
    chunking choices in the reference)."""
    df, Z = corpus
    q = df.where("series_id < 4")
    res = {}
    for d in (1, 2):
        idx = SFAIndex.build(
            df, str(tmp_path / f"depth{d}"), word_length=8, alphabet=8, prefix_len=d
        )
        res[d] = sorted(
            (r["q_id"], r["rk"], r["nn_id"], round(r["dist"], 9))
            for r in idx.knn(q, k=3).collect()
        )
    assert res[1] == res[2]


def test_out_of_distribution_query_falls_back_to_full_scan(spark, corpus, tmp_path):
    """A query whose SFA prefix bucket is EMPTY must still return the
    exact neighbors (phase-1 probe finds nothing → ub=∞ → phase 2
    scans all boxes)."""
    import numpy as np

    df, Z = corpus
    idx = SFAIndex.build(df, str(tmp_path / "ood"), word_length=8, alphabet=8, prefix_len=2)
    # extreme query far outside the corpus distribution
    q_vec = np.full(64, 0.0)
    q_vec[:32] = 50.0
    q_vec[32:] = -50.0
    q_vec = (q_vec - q_vec.mean()) / q_vec.std()
    q = spark.createDataFrame(
        [(777, q_vec.tolist())], "series_id long, values array<double>"
    )
    res = idx.knn(q, k=2).collect()
    D = np.sqrt(((Z - q_vec) ** 2).sum(axis=1))
    order = np.lexsort((np.arange(len(Z)), D))
    got = sorted((r["rk"], r["nn_id"]) for r in res)
    assert got == [(1, int(order[0])), (2, int(order[1]))]


def test_index_load_roundtrip(spark, corpus, tmp_path):
    """An index loaded from disk must answer exactly like the builder's
    in-memory handle (model bins + layout fully persisted)."""
    df, Z = corpus
    path = str(tmp_path / "persist")
    built = SFAIndex.build(df, path, word_length=8, alphabet=8, prefix_len=2)
    loaded = SFAIndex.load(spark, path, prefix_len=2)
    q = df.where("series_id < 3")
    a = sorted(
        (r["q_id"], r["rk"], r["nn_id"], round(r["dist"], 9))
        for r in built.knn(q, k=3).collect()
    )
    b = sorted(
        (r["q_id"], r["rk"], r["nn_id"], round(r["dist"], 9))
        for r in loaded.knn(q, k=3).collect()
    )
    assert a == b


def test_knn_blocked_mode_equals_broadcast_mode(spark, corpus, tmp_path):
    """broadcast_queries=False (large-batch path) must return exactly
    the broadcast plan's rows. Under autoBroadcastJoinThreshold=-1
    (simulating a query batch past the broadcast budget, so only
    explicit hints can broadcast) the blocked plan must contain NO
    BroadcastHashJoin on the prefix columns — both phases shuffle-join
    on p0/p1 — while the default path keeps its hinted prefix BHJs.
    The only query-batch-INdependent broadcasts left (seg-rank /
    summary metadata) are constant-sized and allowed."""
    df, Z = corpus
    idx = SFAIndex.build(
        df, str(tmp_path / "idxblk"), word_length=8, alphabet=8, prefix_len=2
    )
    queries = df.where(F.col("series_id") < 8)
    bcast = idx.knn(queries, k=3)
    rows_b = {(r["q_id"], r["rk"]): (r["nn_id"], round(r["dist"], 9))
              for r in bcast.collect()}
    plan_bcast = bcast._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"BroadcastHashJoin \[p0#", plan_bcast), plan_bcast

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        blocked = idx.knn(queries, k=3, broadcast_queries=False)
        rows_s = {(r["q_id"], r["rk"]): (r["nn_id"], round(r["dist"], 9))
                  for r in blocked.collect()}
        plan_blocked = (
            blocked._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert rows_b == rows_s
    assert not re.search(r"BroadcastHashJoin \[p0#", plan_blocked), plan_blocked
    assert re.search(
        r"(SortMergeJoin|ShuffledHashJoin) \[p0#", plan_blocked
    ), plan_blocked
