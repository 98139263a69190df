"""Golden-style accuracy tests on seeded CBF (mirrors the reference's
AbstractClassifierTest: accuracy within a tolerance on a known
dataset; here synthetic CBF with a conservative floor)."""

import pytest
from pyspark.sql import functions as F

from sfa_spark.ml import classifiers as C
from sfa_spark.sources.cbf import cbf_dataset


@pytest.fixture(scope="module")
def cbf(spark):
    train_arrays, train_labels = cbf_dataset(spark, n_per_class=8, seed=1)
    test_arrays, test_labels = cbf_dataset(spark, n_per_class=15, seed=2, id_offset=1000)
    return (
        train_arrays.cache(), train_labels.cache(),
        test_arrays.cache(), test_labels.cache(),
    )


def _accuracy(pred, labels):
    joined = pred.join(labels, "series_id")
    return joined.agg(
        F.avg((F.col("pred_label") == F.col("label")).cast("double"))
    ).collect()[0][0]


def test_boss_ensemble_cbf(spark, cbf):
    tr_a, tr_l, te_a, te_l = cbf
    model = C.boss_ensemble_fit(
        tr_a, tr_l, windows=[16, 24, 32], word_lengths=(6, 8), alphabet=4
    )
    assert len(model.members) >= 1
    acc = _accuracy(model.predict(te_a), te_l)
    assert acc >= 0.75, f"BOSS ensemble CBF accuracy {acc}"


def test_bossvs_cbf(spark, cbf):
    tr_a, tr_l, te_a, te_l = cbf
    model = C.bossvs_fit(
        tr_a, tr_l, windows=[16, 32], word_lengths=(4, 6), alphabet=4, n_folds=3
    )
    acc = _accuracy(model.predict(te_a), te_l)
    assert acc >= 0.7, f"BOSS VS CBF accuracy {acc}"


def test_weasel_cbf(spark, cbf):
    tr_a, tr_l, te_a, te_l = cbf
    model = C.weasel_fit(
        tr_a, tr_l, windows=[12, 20, 28], word_length=4, alphabet=4
    )
    pred = C.weasel_predict(model, te_a)
    acc = _accuracy(pred, te_l)
    assert acc >= 0.75, f"WEASEL CBF accuracy {acc}"


def test_mllib_pipeline_composition(spark, cbf):
    """SURVEY §2.10: engine stages compose in a pyspark.ml Pipeline."""
    from pyspark.ml import Pipeline

    from sfa_spark.ml.pipeline import BagOfPatterns, SFAWords

    tr_a, _, te_a, _ = cbf
    pipe = Pipeline(stages=[SFAWords(window=16, wordLength=4), BagOfPatterns()])
    fitted = pipe.fit(tr_a)
    out = fitted.transform(te_a)
    assert set(out.columns) == {"series_id", "word", "cnt"}
    assert out.count() > 0
    # same series set in, same out
    assert out.select("series_id").distinct().count() == te_a.count()


@pytest.mark.grid
def test_weasel_grid_cbf(spark, cbf):
    tr_a, tr_l, te_a, te_l = cbf
    model = C.weasel_fit_grid(
        tr_a, tr_l, windows=[16, 24], word_lengths=(4, 6), n_folds=3
    )
    acc = _accuracy(C.weasel_predict(model, te_a), te_l)
    assert acc >= 0.75, f"WEASEL grid CBF accuracy {acc}"


def test_mllib_fallback_matches_local_solve(spark, monkeypatch):
    """Above the nnz gate the linear solve routes to MLlib
    LogisticRegression over distributed SparseVectors (same objective as
    the driver solve) — predictions must agree with the local path and
    the bags must never be collected."""
    import numpy as np

    rng = np.random.RandomState(17)
    rows, lab_rows = [], []
    for sid in range(60):
        label = float(sid % 3)
        lab_rows.append((sid, label))
        for j in range(12):
            key = int(rng.randint(0, 40))
            cnt = int(rng.randint(1, 4)) + (3 if key % 3 == int(label) else 0)
            rows.append((sid, key, cnt))
    kept = spark.createDataFrame(rows, "series_id long, key bigint, cnt long") \
        .groupBy("series_id", "key").agg(F.sum("cnt").alias("cnt"))
    labels = spark.createDataFrame(lab_rows, "series_id long, label double")

    w_loc, b_loc, lm_loc, *_ = C._fit_local_softmax(kept, labels, "bigint", 100, 1.0)
    monkeypatch.setattr(C, "SOLVE_NNZ_BUDGET_BYTES", 1)
    w_dist, b_dist, lm_dist, *rest = C._fit_local_softmax(kept, labels, "bigint", 100, 1.0)
    assert lm_loc == lm_dist and rest[:3] == [None, None, None]

    ids = labels.select("series_id").distinct()
    p_loc = {r["series_id"]: r["pred_label"]
             for r in C._score_with_weights(kept, ids, w_loc, b_loc, lm_loc).collect()}
    p_dist = {r["series_id"]: r["pred_label"]
              for r in C._score_with_weights(kept, ids, w_dist, b_dist, lm_dist).collect()}
    agree = sum(p_loc[s] == p_dist[s] for s in p_loc) / len(p_loc)
    assert agree >= 0.95, f"local vs MLlib prediction agreement {agree}"
