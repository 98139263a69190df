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

# Slow tier: full reference default-grid fits on the bundled UCR
# fixtures. Deselected by the default gate (pytest.ini addopts); run
# explicitly with `pytest -m golden`.
pytestmark = pytest.mark.golden

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
    [
        ("CBF", 0.999),
        ("Coffee", 1.000),
        # Beef measures 0.800 — identical to the runnable reference
        # (tools/refharness Instrument on /root/reference; published
        # golden 0.833, band >= 0.783). Root causes found by diffing the
        # full 2892-cell LOO grid against the instrumented reference:
        # (1) the packed-FFT tail semantics (zeroed packed slot, zero-pad
        # beyond the window, odd-window artifact pair — spectral.py), and
        # (2) fit()'s vote-weight Score mutation (grid.py). After both,
        # every grid cell, every member, and every test prediction match
        # the reference exactly.
        ("Beef", 0.833),
        ("variable_length", 0.929),
    ],
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
    [("CBF", 0.998), ("Coffee", 1.000), ("Beef", 0.833)],
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
    [("CBF", 0.969), ("Coffee", 1.000), ("Beef", 0.800), ("variable_length", 0.929)],
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
    [("CBF", 0.998), ("Coffee", 1.000), ("Beef", 0.800), ("variable_length", 0.964)],
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
    "dataset,golden,g_earl,earl_band,v3_parity",
    [
        # r4 parity set (all fits now run-deterministic): OvR
        # liblinear-style slave probabilities + java-Random(1)
        # contiguous CV folds, the 250-capped snapshot grid
        # (getMax(·, MAX_WINDOW_LENGTH), TEASERClassifier.java:36,142),
        # prefix re-z-norm (TimeSeries.getSubsequence), decimal-summed
        # ANOVA/logits. Measured: CBF acc 0.990 / earliness 0.639 —
        # inside the reference's own ±0.05 (AbstractClassifierTest:25).
        ("CBF", 0.982, 0.64, 0.05, False),
        # Coffee/variable_length (the two fixtures longer than the 250
        # cap) decide EARLIER than published at equal-or-better
        # accuracy: measured 0.384 (Coffee) / 0.311 (VL), v=2. The
        # residual divergence is the v-threshold cliff: predicting with
        # v=3 reproduces the published numbers within the reference's
        # own ±0.05 (0.518 vs 0.47; 0.427 vs 0.39 — asserted below).
        # Our HM search legitimately picks v=2 because the tightly
        # converged slaves hold 1.0 full-series train accuracy, while
        # liblinear's eps=0.1 under-converged slaves make train
        # mistakes that push the reference's search to v=3 — an iterate
        # position not reproducible without its exact float trajectory
        # (ml/linear.fit_ovr_lr convergence note).
        ("Coffee", 1.000, 0.47, 0.10, True),
        ("variable_length", 0.929, 0.39, 0.10, True),
    ],
)
def test_teaser_golden(spark, dataset, golden, g_earl, earl_band, v3_parity):
    """TEASER with WEASEL slaves + one-class-SVM master on the bundled
    fixtures (TEASERClassifierTest.java:13-18, S=10). Accuracy within
    the reference DELTA; earliness within the documented band at our
    deterministic v, and at the reference's own ±0.05 under v=3 for
    the capped fixtures (the published operating point)."""
    from sfa_spark.ml import teaser_weasel as tw

    tr, te = _load(spark, dataset)
    model = tw.teaser_weasel_fit(
        tr.select("series_id", "values"), tr.select("series_id", "label"),
        s_total=10,
    )

    def _eval():
        pred = tw.teaser_weasel_predict(model, te.select("series_id", "values"))
        joined = pred.join(te.select("series_id", "label"), "series_id", "right")
        r = joined.agg(
            F.avg((F.col("pred_label") == F.col("label")).cast("double")),
            F.avg("earliness"),
        ).collect()[0]
        return r[0] or 0.0, r[1]

    acc, earl = _eval()
    assert abs(acc - golden) <= DELTA, f"{dataset}: acc {acc} vs golden {golden}"
    assert abs(earl - g_earl) <= earl_band, (
        f"{dataset}: earliness {earl} vs {g_earl} (band {earl_band})"
    )
    if v3_parity:
        # never LATER than published beyond the reference's own band —
        # the wide band above only covers the earlier-at-equal-accuracy
        # side of the frontier
        assert earl <= g_earl + DELTA, f"{dataset}: late at v=2 ({earl})"
        model.threshold = 3
        acc3, earl3 = _eval()
        assert abs(acc3 - golden) <= DELTA
        assert abs(earl3 - g_earl) <= DELTA, (
            f"{dataset}: v=3 earliness {earl3} vs {g_earl} (±{DELTA})"
        )


@pytest.mark.parametrize(
    "dataset,golden",
    [("CBF", 0.991), ("Coffee", 0.929), ("Beef", 0.900)],
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


# ---------------------------------------------------------------------------
# Multivariate fixture runs. The reference ships NO asserted goldens for
# MUSE/MTEASER (MTEASERClassifierTest.java only prints scores), so these
# are accuracy FLOORS on the bundled fixtures — they catch systematic
# regressions (wrong keys, broken χ², loader drift) without claiming a
# published number.

MVDATA = "/root/reference/src/main/resources/datasets/multivariate"


def _load_mv(spark, name, use_derivatives=True):
    from sfa_spark.sources.multivariate import read_multivariate_file

    tr, tr_lab = read_multivariate_file(
        spark, f"{MVDATA}/{name}/{name}_TRAIN3", use_derivatives=use_derivatives
    )
    te, te_lab = read_multivariate_file(
        spark, f"{MVDATA}/{name}/{name}_TEST3", use_derivatives=use_derivatives
    )
    return tr, tr_lab.cache(), te, te_lab.cache()


@pytest.mark.parametrize(
    "dataset,windows,floor,test_cap",
    [
        # PenDigits: 8-point series, 2 dims (+2 derivative dims).
        # MUSE paper (Schäfer & Leser, CIKM'17) reports ~0.91 full-grid;
        # this bounded grid floors at 0.85 on the first 1000 test series.
        ("PenDigits", [4, 6, 8], 0.85, 1000),
        # ECG: 2 dims, variable length (39..152). Floor 0.70.
        ("ECG", [8, 16, 32], 0.70, None),
    ],
)
def test_muse_fixture_floor(spark, dataset, windows, floor, test_cap):
    from sfa_spark.ml.classifiers import muse_fit, muse_predict
    from sfa_spark.sources.multivariate import dim_arrays

    tr, tr_lab, te, te_lab = _load_mv(spark, dataset)
    tr_a = dim_arrays(tr).cache()
    te_a = dim_arrays(te)
    if test_cap is not None:
        keep = te_lab.orderBy("series_id").limit(test_cap).select("series_id")
        te_a = te_a.join(keep, "series_id")
        te_lab = te_lab.join(keep, "series_id")
    te_a = te_a.cache()
    model = muse_fit(tr_a, tr_lab, windows=windows)
    acc = _accuracy(muse_predict(model, te_a), te_lab)
    assert acc >= floor, f"MUSE {dataset}: acc {acc} < floor {floor}"


def test_muse_grid_default_pendigits(spark):
    """MUSE with the REFERENCE-DEFAULT grid (histType {equi-depth,
    equi-width} × norm {T,F} × f {2,4,6}, windows = the full 2..length
    envelope — MUSEClassifier.java:163-268) on the bundled PenDigits
    fixture. The MUSE paper (Schäfer & Leser, CIKM'17) reports ~0.91;
    assert paper-level ≥0.90 on the first 1000 test series (the bounded
    caller-window fit floors at 0.85 — test_muse_fixture_floor)."""
    from sfa_spark.ml import grid
    from sfa_spark.sources.multivariate import dim_arrays

    tr, tr_lab, te, te_lab = _load_mv(spark, "PenDigits")
    tr_a = dim_arrays(tr).cache()
    te_a = dim_arrays(te)
    keep = te_lab.orderBy("series_id").limit(1000).select("series_id")
    te_a = te_a.join(keep, "series_id").cache()
    te_lab2 = te_lab.join(keep, "series_id")
    model = grid.muse_grid_fit(tr_a, tr_lab)
    acc = _accuracy(model.predict(te_a), te_lab2)
    assert acc >= 0.90, f"MUSE default grid PenDigits: acc {acc} < 0.90"


def test_mteaser_fixture_floor(spark):
    """MTEASER on the bundled ECG fixture: early AND accurate floors."""
    from sfa_spark.ml.teaser import mteaser_fit, mteaser_predict
    from sfa_spark.sources.multivariate import dim_arrays

    tr, tr_lab, te, te_lab = _load_mv(spark, "ECG")
    tr_a = dim_arrays(tr).cache()
    te_a = dim_arrays(te).cache()
    model = mteaser_fit(tr_a, tr_lab, n_snapshots=4, window=8, word_length=4)
    dec = mteaser_predict(model, te_a).cache()
    joined = dec.join(te_lab, "series_id", "right")
    r = joined.agg(
        F.avg((F.col("pred_label") == F.col("label")).cast("double")),
        F.avg("earliness"),
    ).collect()[0]
    acc, earl = r[0] or 0.0, r[1] or 1.0
    assert acc >= 0.6, f"MTEASER ECG acc {acc}"
    assert earl <= 0.95, f"MTEASER ECG earliness {earl} (never early)"
