"""Spectral properties — mirrors the reference's MFTTest
(windowed MFT ≡ per-window DFT; DFT distance lower-bounds ED) and
SFAWordsTest/SFAWordsWindowingTest invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sfa_spark.functions import spectral
from sfa_spark.operators import sfa
from sfa_spark.sources.synthetic import random_walk
from sfa_spark.sources.events import series_to_arrays


def _ref_window_dft(win, l, lower_bounding=True, norm_mean=False, std_norm=True):
    """Straight per-window rfft with the reference conventions."""
    w = len(win)
    spec = np.fft.rfft(win)
    start = 1 if norm_mean else 0
    ks = np.arange(start, start + (l + 1) // 2)
    ks = ks[ks < len(spec)]
    vals = np.zeros(l)
    inter = np.empty(2 * len(ks))
    inter[0::2] = spec[ks].real
    inter[1::2] = -spec[ks].imag
    vals[: len(inter)] = inter[:l]
    norm = 1 / np.sqrt(w) if lower_bounding else 1.0
    if std_norm:
        s = win.std()
        norm *= 1 / s if s > 0 else 1.0
    return vals * norm


@pytest.mark.parametrize("method", ["fft", "recurrence"])
def test_mft_windows_equal_per_window_dft(method):
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, 200)
    w, l = 32, 8
    out = spectral.mft_all_windows(x, w, l, norm_mean=True, method=method)
    assert out.shape == (200 - 32 + 1, l)
    for t in [0, 1, 50, 168]:
        ref = _ref_window_dft(x[t : t + w], l, norm_mean=True)
        assert np.allclose(out[t], ref, atol=1e-8), f"window {t} ({method})"


def test_mft_recurrence_matches_fft_method():
    rng = np.random.default_rng(6)
    x = rng.normal(0, 1, 500)
    a = spectral.mft_all_windows(x, 64, 12, method="fft")
    b = spectral.mft_all_windows(x, 64, 12, method="recurrence")
    assert np.allclose(a, b, atol=1e-7)


def test_mft_odd_window_packed_tail_at_p_equals_w():
    """Odd w with l + offset == w reaches the packed kstar pair once the
    reference evenizes wordLength (w → w+1), so slot w−1 must carry the
    recurrence-mutated Re[kstar] for t ≥ 1 — not the true per-window
    DFT value (ADVICE r3: condition is P >= w, not P >= w+1)."""
    rng = np.random.default_rng(11)
    w, l = 15, 15  # norm_mean=False → offset 0, P = 15 == w
    x = rng.normal(0, 1, 40)
    out = spectral.mft_all_windows(
        x, w, l, norm_mean=False, apply_z_norm=False, method="fft"
    )
    kstar = (w - 1) // 2
    phi = np.exp(2j * np.pi * kstar / w)
    X = complex(np.fft.rfft(x[:w])[kstar].real, 0.0)  # half-fake (Re, 0)
    norm = 1.0 / np.sqrt(w)
    assert np.isclose(out[0, 2 * kstar], X.real * norm)
    for t in range(1, len(out)):
        X = phi * (X + (x[t + w - 1] - x[t - 1]))  # reference recurrence
        assert np.isclose(out[t, 2 * kstar], X.real * norm), t
        true_re = np.fft.rfft(x[t : t + w])[kstar].real * norm
        if t == 3:  # generically differs from the true coefficient
            assert not np.isclose(out[t, 2 * kstar], true_re)


def test_dft_distance_lower_bounds_euclidean():
    """Parseval: 2·Σ|ΔX_k|²/N over kept coefficients ≤ Σ(a−b)²
    for z-normalized series (reference MFTTest.testMFTLowerBound)."""
    rng = np.random.default_rng(7)
    for _ in range(10):
        a = rng.normal(0, 1, 64)
        b = rng.normal(0, 1, 64)
        a = (a - a.mean()) / a.std()
        b = (b - b.mean()) / b.std()
        ed2 = ((a - b) ** 2).sum()
        for l in (4, 8, 16):
            da = spectral.dft_values(a, l, pad_pow2=True)
            db = spectral.dft_values(b, l, pad_pow2=True)
            lb = 2 * ((da - db) ** 2).sum()
            assert lb <= ed2 + 1e-9


def test_dft_spark_matches_numpy(spark):
    rng = np.random.default_rng(8)
    data = [(i, rng.normal(0, 1, 32).tolist()) for i in range(5)]
    df = spark.createDataFrame(data, "series_id long, values array<double>")
    got = {r["series_id"]: np.array(r["coefs"]) for r in spectral.dft(df, 8).collect()}
    for sid, vals in data:
        assert np.allclose(got[sid], spectral.dft_values(np.array(vals), 8), atol=1e-12)


@pytest.fixture(scope="module")
def walk_arrays(spark):
    return series_to_arrays(random_walk(spark, n_series=8, length=96, seed=13)).cache()


def test_sfa_words_invariants(spark, walk_arrays):
    w, l, a = 24, 6, 4
    model = sfa.fit(walk_arrays, window=w, word_length=l, alphabet=a,
                    histogram="equi_depth", norm_mean=True)
    bins = {r["seg"]: r["bins"] for r in model.bins.collect()}
    assert set(bins) == set(range(l))
    for bs in bins.values():
        assert len(bs) == a - 1
        assert bs == sorted(bs)  # monotone boundaries (SFAWordsTest)
    wd = sfa.transform_windowing(model, walk_arrays)
    cnt = wd.groupBy("series_id").count().collect()
    assert all(r["count"] == 96 - w + 1 for r in cnt)  # n-w+1 windows
    max_word = wd.agg(F.max("word")).collect()[0][0]
    assert max_word < (1 << (2 * l))  # symbols within alphabet bits


def test_sfa_model_save_load_roundtrip(spark, walk_arrays, tmp_path):
    model = sfa.fit(walk_arrays, window=16, word_length=4, alphabet=4)
    words1 = sfa.transform_windowing(model, walk_arrays).orderBy("series_id", "win")
    model.save(str(tmp_path / "m"))
    model2 = sfa.SFAModel.load(spark, str(tmp_path / "m"))
    words2 = sfa.transform_windowing(model2, walk_arrays).orderBy("series_id", "win")
    assert [r["word"] for r in words1.collect()] == [r["word"] for r in words2.collect()]


def test_sfa_supervised_prefers_separating_coefficient(spark):
    # two classes differing in low-frequency content
    rng = np.random.default_rng(9)
    rows, labels = [], []
    for i in range(20):
        t = np.linspace(0, 4 * np.pi, 64)
        label = float(i % 2)
        sig = np.sin(t) * (3.0 if label else 0.3) + rng.normal(0, 0.2, 64)
        rows.append((i, sig.tolist()))
        labels.append((i, label))
    arrays = spark.createDataFrame(rows, "series_id long, values array<double>")
    lab = spark.createDataFrame(labels, "series_id long, label double")
    model = sfa.fit_supervised(arrays, lab, window=64, word_length=4,
                               alphabet=4, max_coefs=12, norm_mean=False)
    assert model.best_segs is not None and len(model.best_segs) == 4
    wd = sfa.transform_windowing(model, arrays)
    assert wd.count() == 20  # one window per series (n == w)


def test_variable_length_series_words(spark):
    """Reference SFAWordsVariableLengthTest: series of different lengths
    all transform; window count = n-w+1 per series; too-short dropped."""
    import numpy as np

    rng = np.random.default_rng(43)
    lengths = [40, 56, 64, 30, 10]  # 10 < w → dropped
    data = [(i, rng.normal(0, 1, n).tolist()) for i, n in enumerate(lengths)]
    arrays = spark.createDataFrame(data, "series_id long, values array<double>")
    w = 16
    usable = arrays.where(F.size("values") >= w)
    model = sfa.fit(usable, window=w, word_length=4, alphabet=4)
    words = sfa.transform_windowing(model, usable)
    counts = {r["series_id"]: r["count"] for r in words.groupBy("series_id").count().collect()}
    assert counts == {0: 25, 1: 41, 2: 49, 3: 15}
