"""Golden-accuracy parity vs the reference's bundled UCR fixtures.

The reference asserts each classifier's train/test accuracy on bundled
datasets within DELTA = 0.05
(`/root/reference/src/test/java/sfa/classification/AbstractClassifierTest.java:25,111-126`).
These tests load the SAME fixture files with the S1 loader and assert
the SAME published numbers — converting "runs and self-consistent"
into "matches the reference".

Golden numbers (BASELINE.md rows 1-10):
  * BOSS Ensemble — CBF 0.999, Coffee 1.000   (BossEnsembleClassifierTest.java:11-19)
  * BOSS VS       — CBF 0.998, Coffee 1.000   (BossVSClassifierTest.java:12-18)
  * Shotgun       — CBF 0.969, Coffee 1.000   (ShotgunClassifierTest.java:10-17)
  * Shotgun Ens.  — CBF 0.991, Coffee 0.929   (ShotgunEnsembleClassifierTest.java:10-17)
  * WEASEL        — CBF 0.998, Coffee 1.000   (WEASELClassifierTest.java:12-19)
  * TEASER        — CBF acc 0.982 @ earl 0.64 (TEASERClassifierTest.java:16-18)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfa_spark.sources.ucr import read_ucr

DATA = "/root/reference/src/main/resources/datasets/univariate"
DELTA = 0.05


def _load(spark, name):
    tr = read_ucr(spark, f"{DATA}/{name}/{name}_TRAIN").cache()
    te = read_ucr(spark, f"{DATA}/{name}/{name}_TEST").cache()
    return tr, te


def _accuracy(pred, truth):
    joined = pred.join(truth.select("series_id", "label"), "series_id", "right")
    r = joined.agg(
        F.sum((F.col("pred_label") == F.col("label")).cast("long")),
        F.count(F.lit(1)),
    ).collect()[0]
    return (r[0] or 0) / r[1]


@pytest.mark.parametrize(
    "dataset,golden",
    [("CBF", 0.999), ("Coffee", 1.000)],
)
def test_boss_ensemble_golden(spark, dataset, golden):
    from sfa_spark.ml import grid

    tr, te = _load(spark, dataset)
    model = grid.boss_ensemble_grid_fit(
        tr.select("series_id", "values"), tr.select("series_id", "label")
    )
    acc = _accuracy(model.predict(te.select("series_id", "values")), te)
    assert abs(acc - golden) <= DELTA, f"{dataset}: acc {acc} vs golden {golden}"


@pytest.mark.parametrize(
    "dataset,golden",
    [("CBF", 0.998), ("Coffee", 1.000)],
)
def test_bossvs_golden(spark, dataset, golden):
    from sfa_spark.ml import grid

    tr, te = _load(spark, dataset)
    model = grid.bossvs_grid_fit(
        tr.select("series_id", "values"), tr.select("series_id", "label")
    )
    acc = _accuracy(model.predict(te.select("series_id", "values")), te)
    assert abs(acc - golden) <= DELTA, f"{dataset}: acc {acc} vs golden {golden}"


@pytest.mark.parametrize(
    "dataset,golden",
    [("CBF", 0.969), ("Coffee", 1.000)],
)
def test_shotgun_golden(spark, dataset, golden):
    from sfa_spark.ml import grid

    tr, te = _load(spark, dataset)
    model = grid.shotgun_grid_fit(
        tr.select("series_id", "values"), tr.select("series_id", "label")
    )
    acc = _accuracy(model.predict(te.select("series_id", "values")), te)
    assert abs(acc - golden) <= DELTA, f"{dataset}: acc {acc} vs golden {golden}"


@pytest.mark.parametrize(
    "dataset,golden",
    [("CBF", 0.998), ("Coffee", 1.000)],
)
def test_weasel_golden(spark, dataset, golden):
    from sfa_spark.ml import grid

    tr, te = _load(spark, dataset)
    model = grid.weasel_grid_fit(
        tr.select("series_id", "values"), tr.select("series_id", "label")
    )
    acc = _accuracy(model.predict(te.select("series_id", "values")), te)
    assert abs(acc - golden) <= DELTA, f"{dataset}: acc {acc} vs golden {golden}"


@pytest.mark.parametrize(
    "dataset,golden",
    [("CBF", 0.991), ("Coffee", 0.929)],
)
def test_shotgun_ensemble_golden(spark, dataset, golden):
    from sfa_spark.ml import grid

    tr, te = _load(spark, dataset)
    model = grid.shotgun_grid_fit(
        tr.select("series_id", "values"),
        tr.select("series_id", "label"),
        factor=0.92,
        ensemble=True,
    )
    acc = _accuracy(model.predict(te.select("series_id", "values")), te)
    assert abs(acc - golden) <= DELTA, f"{dataset}: acc {acc} vs golden {golden}"
