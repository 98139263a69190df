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


def test_weasel_grid_cbf(spark, cbf):
    tr_a, tr_l, te_a, te_l = cbf
    model = C.weasel_fit_grid(
        tr_a, tr_l, windows=[16, 24], word_lengths=(4, 6), n_folds=3
    )
    acc = _accuracy(C.weasel_predict(model, te_a), te_l)
    assert acc >= 0.75, f"WEASEL grid CBF accuracy {acc}"
