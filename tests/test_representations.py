"""Representation invariants — mirrors the reference's
TightnessOfLowerBounds harness: every representation's distance must
lower-bound the true Euclidean distance on random-walk pairs, and
inverses must reconstruct (exactly at full length, approximately when
truncated)."""

import numpy as np
import pytest

from sfa_spark.functions import representations as R


@pytest.fixture(scope="module")
def pairs():
    rng = np.random.default_rng(17)
    out = []
    for _ in range(12):
        a = np.cumsum(rng.normal(0, 1, 64))
        b = np.cumsum(rng.normal(0, 1, 64))
        a = (a - a.mean()) / a.std()
        b = (b - b.mean()) / b.std()
        out.append((a, b))
    return out


@pytest.mark.parametrize(
    "kind,l,lb",
    [
        ("paa", 8, R.paa_lb_distance),
        ("pla", 8, R.pla_lb_distance),
        ("dwt", 8, R.dwt_lb_distance),
    ],
)
def test_lower_bounds_euclidean(pairs, kind, l, lb):
    kernel = R._KERNELS[kind]
    tightness = []
    for a, b in pairs:
        ed = float(np.sqrt(((a - b) ** 2).sum()))
        d = lb(kernel(a, l), kernel(b, l), len(a))
        assert d <= ed + 1e-9, f"{kind}: LB {d} > ED {ed}"
        tightness.append(d / ed if ed else 1.0)
    assert np.mean(tightness) > 0.1  # non-degenerate bound


def test_apca_asymmetric_lower_bound(pairs):
    """APCA LB takes the raw query + candidate APCA (asymmetric, like
    the reference's getDistance(t1, t2, originalQuery, …))."""
    tightness = []
    for q, c in pairs:
        ed = float(np.sqrt(((q - c) ** 2).sum()))
        d = R.apca_lb_distance(q, R.apca_values(c, 8), len(q))
        assert d <= ed + 1e-9, f"APCA LB {d} > ED {ed}"
        tightness.append(d / ed if ed else 1.0)
    assert np.mean(tightness) > 0.1


@pytest.mark.parametrize("kind", ["paa", "pla", "dwt", "apca"])
def test_inverse_reconstructs_at_full_length(kind):
    rng = np.random.default_rng(23)
    x = rng.normal(0, 1, 32)
    kernel = R._KERNELS[kind]
    inv = {
        "paa": R.paa_inverse,
        "pla": R.pla_inverse,
        "dwt": R.dwt_inverse,
        "apca": R.apca_inverse,
    }[kind]
    full_l = {"paa": 32, "pla": 64, "dwt": 32, "apca": 64}[kind]
    rec = inv(kernel(x, full_l), 32)
    assert np.allclose(rec, x, atol=1e-8), f"{kind} full-length reconstruction"


def test_truncated_inverse_reduces_error_with_l():
    rng = np.random.default_rng(29)
    x = np.cumsum(rng.normal(0, 1, 64))
    errs = []
    for l in (4, 8, 16, 32):
        rec = R.dwt_inverse(R.dwt_values(x, l), 64)
        errs.append(((rec - x) ** 2).sum())
    assert errs == sorted(errs, reverse=True)


def test_apca_segments_cover_series():
    rng = np.random.default_rng(31)
    x = rng.normal(0, 1, 40)
    c = R.apca_values(x, 8)
    ends = c[1::2]
    assert ends[-1] == 39 and list(ends) == sorted(ends)


def test_spark_transform_wrapper(spark):
    rng = np.random.default_rng(37)
    data = [(i, rng.normal(0, 1, 32).tolist()) for i in range(4)]
    df = spark.createDataFrame(data, "series_id long, values array<double>")
    for kind in ("paa", "pla", "dwt", "apca"):
        got = {r["series_id"]: r["coefs"] for r in R.transform(df, kind, 8).collect()}
        for sid, vals in data:
            ref = R._KERNELS[kind](np.array(vals), 8)
            assert np.allclose(got[sid], ref, atol=1e-9), kind
