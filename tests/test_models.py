"""tf-idf, χ², ANOVA-F, 1-NN, folds — checked against tiny hand
computations / numpy references."""

import math

import pytest
from pyspark.sql import functions as F

from sfa_spark.operators import folds, knn, select, tfidf


def test_tfidf_weights_manual(spark):
    # 2 classes; word 1 only in class 0, word 2 in both
    bag = spark.createDataFrame(
        [
            (0, 1, 2, 0),
            (1, 2, 1, 0),
            (2, 2, 3, 1),
        ],
        "series_id long, word long, cnt long, label long",
    )
    m = {(r["label"], r["word"]): r["weight"] for r in tfidf.fit_tfidf(bag).collect()}
    # class 0: w1 tf=2 df=1 → (1+log10 2)·log10(1+2/1); w2 tf=1 df=2 → 0 (in all classes)
    w1 = (1 + math.log10(2)) * math.log10(3)
    assert abs(m[(0, 1)] - 1.0) < 1e-9  # L2-normalized single nonzero → 1
    assert m[(0, 2)] == 0.0 and m[(1, 2)] == 0.0


def test_tfidf_predict_argmax(spark):
    model = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.1), (1, 2, 0.9), (1, 3, 0.3)],
        "label long, word long, weight double",
    )
    test = spark.createDataFrame(
        [(10, 1, 3), (10, 2, 1), (11, 3, 2)],
        "series_id long, word long, cnt long",
    )
    pred = {r["series_id"]: r["pred_label"] for r in tfidf.score_tfidf(test, model).collect()}
    assert pred == {10: 0, 11: 1}


def test_anova_f_matches_scipy_formula(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    groups = {0.0: rng.normal(0, 1, 30), 1.0: rng.normal(1.5, 1, 30)}
    rows = [(0, float(v), lbl) for lbl, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "seg int, coef double, label double")
    f_spark = select.anova_f(df).collect()[0]["f_stat"]
    try:
        from scipy.stats import f_oneway

        f_ref = f_oneway(groups[0.0], groups[1.0]).statistic
    except ImportError:
        a, b = groups[0.0], groups[1.0]
        n = len(a) + len(b)
        gm = (a.sum() + b.sum()) / n
        ssb = len(a) * (a.mean() - gm) ** 2 + len(b) * (b.mean() - gm) ** 2
        ssw = ((a - a.mean()) ** 2).sum() + ((b - b.mean()) ** 2).sum()
        f_ref = (ssb / 1) / (ssw / (n - 2))
    assert abs(f_spark - f_ref) < 1e-6


def test_chi2_uniform_is_zero(spark):
    # identical distribution across classes → chi2 ≈ 0 (kept only with limit 0)
    bag = spark.createDataFrame(
        [(0, 1, 5, 0), (1, 1, 5, 1), (2, 2, 3, 0), (3, 2, 3, 1)],
        "series_id long, word long, cnt long, label long",
    )
    rows = select.chi_squared(bag, limit=-1.0, word_limit=None).collect()
    assert all(abs(r["chi2"]) < 1e-9 for r in rows)


def test_boss_1nn_vs_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(1)
    n_train, n_test, vocab = 12, 4, 20
    train = {i: {int(w): int(rng.integers(1, 5)) for w in rng.choice(vocab, 6, replace=False)} for i in range(n_train)}
    test = {100 + i: {int(w): int(rng.integers(1, 5)) for w in rng.choice(vocab, 6, replace=False)} for i in range(n_test)}

    def dist(q, c):
        return sum((qv - c.get(w, 0)) ** 2 for w, qv in q.items())

    expected = {}
    for qid, q in test.items():
        best = min(train, key=lambda cid: (dist(q, train[cid]), cid))
        expected[qid] = (best, dist(q, train[best]))

    to_df = lambda bags: spark.createDataFrame(
        [(sid, w, c) for sid, b in bags.items() for w, c in b.items()],
        "series_id long, word long, cnt long",
    )
    got = {
        r["series_id"]: (r["nn_id"], r["dist"])
        for r in knn.boss_1nn(to_df(test), to_df(train)).collect()
    }
    assert got == expected


def test_boss_1nn_blocked_equals_sparse(spark):
    """The dense blocked-BLAS path must be BIT-identical to the sparse
    word-join path — same argmin, same exact integer distances, same
    acceptance rule (zero-overlap and identical-bag candidates
    skipped), same smaller-nn_id tie-break — including with multiple
    chunks/query-blocks so the block merge is exercised."""
    import numpy as np

    rng = np.random.default_rng(7)
    n_train, n_test, vocab = 40, 15, 30
    train = {
        i: {int(w): int(rng.integers(1, 6)) for w in rng.choice(vocab, 8, replace=False)}
        for i in range(n_train)
    }
    test = {
        100 + i: {int(w): int(rng.integers(1, 6)) for w in rng.choice(vocab, 8, replace=False)}
        for i in range(n_test)
    }
    # planted edge cases: a candidate identical to one query's bag
    # (dist 0 → skipped) and a candidate with no word overlap with it
    # (corr 0 → skipped)
    train[200] = dict(test[100])
    train[201] = {w + vocab: 3 for w in range(4)}

    to_df = lambda bags: spark.createDataFrame(
        [(sid, w, c) for sid, b in bags.items() for w, c in b.items()],
        "series_id long, word long, cnt long",
    )
    sparse = {
        r["series_id"]: (r["nn_id"], r["dist"])
        for r in knn.boss_1nn(to_df(test), to_df(train)).collect()
    }
    for n_chunks, n_qb in ((1, 1), (4, 1), (3, 2)):
        blocked = {
            r["series_id"]: (r["nn_id"], r["dist"])
            for r in knn.boss_1nn_blocked(
                to_df(test), to_df(train), n_chunks=n_chunks, n_query_blocks=n_qb
            ).collect()
        }
        assert blocked == sparse, (n_chunks, n_qb)


def test_boss_1nn_blocked_dense_vocab(spark):
    """assume_dense_vocab=True (word id used directly as the dense
    column index, no global vocab index) must stay bit-identical to
    both the indexed blocked path and the sparse path — absent-word
    columns are all-zero on both sides and cancel in every distance
    term."""
    import numpy as np

    rng = np.random.default_rng(11)
    vocab = 64  # dense-packed word space, ids in [0, vocab)
    train = {
        i: {int(w): int(rng.integers(1, 6)) for w in rng.choice(vocab, 8, replace=False)}
        for i in range(30)
    }
    test = {
        100 + i: {int(w): int(rng.integers(1, 6)) for w in rng.choice(vocab, 8, replace=False)}
        for i in range(12)
    }
    train[200] = dict(test[100])  # dist 0 → skipped
    to_df = lambda bags: spark.createDataFrame(
        [(sid, w, c) for sid, b in bags.items() for w, c in b.items()],
        "series_id long, word long, cnt long",
    )
    sparse = {
        r["series_id"]: (r["nn_id"], r["dist"])
        for r in knn.boss_1nn(to_df(test), to_df(train)).collect()
    }
    for n_chunks in (1, 4):
        dense = {
            r["series_id"]: (r["nn_id"], r["dist"])
            for r in knn.boss_1nn_blocked(
                to_df(test), to_df(train), n_chunks=n_chunks,
                assume_dense_vocab=True,
            ).collect()
        }
        assert dense == sparse, n_chunks


def test_boss_1nn_blocked_loo(spark):
    """loo=True must skip self-matches on the blocked path too."""
    bags = spark.createDataFrame(
        [(0, 1, 2), (0, 2, 1), (1, 1, 2), (1, 2, 1), (2, 1, 5)],
        "series_id long, word long, cnt long",
    )
    sparse = {
        r["series_id"]: (r["nn_id"], r["dist"])
        for r in knn.boss_1nn(bags, bags, loo=True).collect()
    }
    blocked = {
        r["series_id"]: (r["nn_id"], r["dist"])
        for r in knn.boss_1nn_blocked(bags, bags, loo=True, n_chunks=2).collect()
    }
    assert blocked == sparse


def test_euclidean_knn_exact(spark):
    import numpy as np

    rng = np.random.default_rng(2)
    corpus = rng.normal(0, 1, (8, 16))
    to_long = lambda mat, base: spark.createDataFrame(
        [
            (base + i, int(p), float(v), 16)
            for i, row in enumerate(mat)
            for p, v in enumerate(row)
        ],
        "series_id long, pos long, value double, n long",
    )
    res = knn.euclidean_knn_long(to_long(corpus[:2], 100), to_long(corpus, 0), k=3)
    for r in res.collect():
        true = np.linalg.norm(corpus[r["series_id"] - 100] - corpus[r["nn_id"]])
        assert abs(r["dist"] - true) < 1e-9
    # rank-1 neighbor of a corpus member is itself
    top = {r["series_id"]: r["nn_id"] for r in res.where("rk=1").collect()}
    assert top == {100: 0, 101: 1}


def test_stratified_folds_balanced(spark):
    labeled = spark.createDataFrame(
        [(i, i % 3) for i in range(60)], "series_id long, label long"
    )
    f = folds.stratified_folds(labeled, 10)
    per = f.groupBy("label", "fold").count().collect()
    assert all(r["count"] == 2 for r in per)  # 20 per label / 10 folds


def test_weighted_vote_tie_breaks_larger_label(spark):
    votes = spark.createDataFrame(
        [(1, 0.0, 1.0), (1, 2.0, 1.0)], "series_id long, pred_label double, weight double"
    )
    got = folds.weighted_vote(votes).collect()[0]["pred_label"]
    assert got == 2.0


def test_chi2_sf_matches_known_values():
    from sfa_spark.operators.select import chi2_sf

    # reference points (R: pchisq(x, df, lower.tail=FALSE))
    known = [
        (3.841, 1, 0.05), (5.991, 2, 0.05), (7.815, 3, 0.05),
        (6.635, 1, 0.01), (9.210, 2, 0.01), (13.277, 4, 0.01),
    ]
    for x, dof, p in known:
        assert abs(chi2_sf(x, dof) - p) < 5e-4, (x, dof)


def test_chi2_pvalue_selection(spark):
    from sfa_spark.operators import select

    # words 1/2 perfectly separate the classes (10-of-20 samples each
    # → presence χ² = 10, p ≈ 0.0016); word 3 is uniform (χ² = 0).
    # Presence-count semantics (reference trainChiSquared): cnt
    # magnitude is irrelevant, sample membership is what counts.
    bag = spark.createDataFrame(
        [(i, 1, 30, 0) for i in range(10)]
        + [(10 + i, 2, 30, 1) for i in range(10)]
        + [(i, 3, 10, 0 if i < 10 else 1) for i in range(20)],
        "series_id long, word long, cnt long, label long",
    )
    sel = select.chi_squared_pvalues(bag, p_limit=0.01)
    kept = {r["word"] for r in sel.collect()}
    assert 1 in kept and 2 in kept  # separating words survive
    assert 3 not in kept  # uniform word filtered


def test_filter_by_factor(spark):
    scores = spark.createDataFrame(
        [(1, 1.00), (2, 0.95), (3, 0.90), (4, 0.50)],
        "member long, score double",
    )
    kept = {r["member"] for r in folds.filter_by_factor(scores, 0.92).collect()}
    assert kept == {1, 2}  # >= best * 0.92 = 0.92
