"""Unit tests for the driver-local softmax solver and the
window-free ranked top-k."""

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from sfa_spark.ml import linear
from sfa_spark.operators.topk import ranked_top_k


def test_softmax_separable_converges():
    rng = np.random.RandomState(7)
    X = np.vstack([rng.randn(40, 5) + 4 * off for off in (-1, 0, 1)])
    y = np.repeat([0, 1, 2], 40)
    m = linear.fit_softmax(X, y, 3, lam=1e-4)
    assert (m.predict_idx(X) == y).mean() == 1.0
    p = m.predict_proba(X)
    assert np.allclose(p.sum(axis=1), 1.0)
    assert p[np.arange(len(y)), y].min() > 0.5


def test_softmax_l2_shrinks_weights():
    rng = np.random.RandomState(0)
    X = rng.randn(30, 4)
    y = (X[:, 0] > 0).astype(int)
    w_small = linear.fit_softmax(X, y, 2, lam=1e-6).W
    w_big = linear.fit_softmax(X, y, 2, lam=10.0).W
    assert np.abs(w_big).sum() < np.abs(w_small).sum()


def test_softmax_matches_reference_gradient():
    """Finite-difference check of the objective/gradient pair."""
    rng = np.random.RandomState(3)
    X, k, d = rng.randn(12, 6), 3, 6
    y = rng.randint(0, k, 12)
    Y = np.zeros((12, k))
    Y[np.arange(12), y] = 1.0
    theta = rng.randn(k * d + k) * 0.1
    f0, g = linear._fun_grad(theta, X, Y, 0.5, k, d)
    eps = 1e-6
    for i in rng.choice(len(theta), 5, replace=False):
        t = theta.copy()
        t[i] += eps
        f1, _ = linear._fun_grad(t, X, Y, 0.5, k, d)
        assert abs((f1 - f0) / eps - g[i]) < 1e-4


def test_ranked_top_k_matches_window_rank(spark):
    rng = np.random.RandomState(1)
    rows = [
        (int(i), float(v))
        for i, v in enumerate(rng.randint(0, 50, size=200).astype(float))
    ]
    df = spark.createDataFrame(rows, "id bigint, v double")
    got = {
        (r["id"], r["rk"])
        for r in ranked_top_k(df, [("v", True), ("id", False)], 10).collect()
    }
    w = Window.partitionBy(F.lit(0)).orderBy(F.col("v").desc(), F.col("id").asc())
    want = {
        (r["id"], r["rk"])
        for r in df.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= 10)
        .collect()
    }
    assert got == want


def test_ranked_top_k_fewer_rows_than_k(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 9.0)], "id bigint, v double")
    got = sorted(
        (r["rk"], r["id"])
        for r in ranked_top_k(df, [("v", True), ("id", False)], 10).collect()
    )
    assert got == [(1, 2), (2, 1)]
