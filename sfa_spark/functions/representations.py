"""Dimensionality-reduction representations (SURVEY §2.3 T6-T12):
PAA, PLA, DWT (Haar), APCA — transform, inverse, and lower-bounding
distance for each, as numpy kernels wrapped in Arrow-batched UDFs.

Reference parity (behavioral):
  * PAA  — PAA.transform (`/root/reference/src/main/java/sfa/transformation/PAA.java:28-50`):
    l segment means with FRACTIONAL frame boundaries; LB distance
    scaled by n/l (`PAA.java:69-85`).
  * PLA  — PLA.transform (`.../PLA.java:35-70`): least-squares line per
    frame, (slope, intercept) pairs; closed-form segment LB
    (`PLA.java:93-125`).
  * DWT  — DWT.transform (`.../DWT.java:23-47`): Haar wavelet to pow-2
    length, keep l coefficients. We use the ORTHONORMAL Haar (1/√2
    per level) so Parseval gives the lower bound exactly — a deliberate
    Spark-first deviation from the reference's lifting scale, asserted
    by the LB property test.
  * APCA — APCA.transform (`.../APCA.java:30-149`): adaptive segments
    (Haar keep-largest → merge equal runs → greedy min-error joins to
    l/2 segments), output (value, end) pairs; interval-walk LB
    (`APCA.java:201-272`).

All per-series and inherently sequential (greedy merges) → grouped
pandas UDF territory; parallelism across series. The LB kernels power
two-phase exact search (cheap filter → exact verify) for any
representation — same plan shape as plans/index.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


# ---------------------------------------------------------------- PAA

def paa_values(x: np.ndarray, l: int) -> np.ndarray:
    """Fractional-boundary PAA: segment i covers [i·n/l, (i+1)·n/l);
    boundary samples contribute fractionally to both segments."""
    n = len(x)
    out = np.zeros(l)
    step = n / l
    for i in range(l):
        lo, hi = i * step, (i + 1) * step
        a, b = int(np.floor(lo)), int(np.ceil(hi))
        acc = 0.0
        for j in range(a, min(b, n)):
            w = min(hi, j + 1) - max(lo, j)
            if w > 0:
                acc += x[j] * w
        out[i] = acc / step
    return out


def paa_inverse(coefs: np.ndarray, n: int) -> np.ndarray:
    """Repeat each mean over its frame (PAA.java:52-67)."""
    l = len(coefs)
    idx = (np.arange(n) * l // n).clip(0, l - 1)
    return coefs[idx]


def paa_lb_distance(a: np.ndarray, b: np.ndarray, n: int) -> float:
    """√(n/l · Σ(a−b)²) ≤ ED (PAA.java:69-85)."""
    l = len(a)
    return float(np.sqrt((n / l) * ((a - b) ** 2).sum()))


# ---------------------------------------------------------------- PLA

def pla_values(x: np.ndarray, l: int) -> np.ndarray:
    """l/2 least-squares segments → interleaved (slope, intercept)."""
    n = len(x)
    k = max(1, l // 2)
    bounds = [(i * n // k, (i + 1) * n // k) for i in range(k)]
    out = np.zeros(2 * k)
    for i, (a, b) in enumerate(bounds):
        t = np.arange(b - a, dtype=np.float64)
        y = x[a:b]
        tm, ym = t.mean(), y.mean()
        denom = ((t - tm) ** 2).sum()
        slope = ((t - tm) * (y - ym)).sum() / denom if denom > 0 else 0.0
        out[2 * i] = slope
        out[2 * i + 1] = ym - slope * tm
    return out


def pla_inverse(coefs: np.ndarray, n: int) -> np.ndarray:
    k = len(coefs) // 2
    out = np.zeros(n)
    for i in range(k):
        a, b = i * n // k, (i + 1) * n // k
        t = np.arange(b - a, dtype=np.float64)
        out[a:b] = coefs[2 * i] * t + coefs[2 * i + 1]
    return out


def pla_lb_distance(a: np.ndarray, b: np.ndarray, n: int) -> float:
    """√Σ_segments Σ_t (δslope·t + δicept)² — the closed-form distance
    between the two piecewise-linear reconstructions (PLA.java:93-125);
    lower-bounds ED because each segment fit is the L2 projection."""
    k = len(a) // 2
    total = 0.0
    for i in range(k):
        m = (i + 1) * n // k - i * n // k
        ds, di = a[2 * i] - b[2 * i], a[2 * i + 1] - b[2 * i + 1]
        t = np.arange(m, dtype=np.float64)
        total += ((ds * t + di) ** 2).sum()
    return float(np.sqrt(total))


# ---------------------------------------------------------------- DWT (orthonormal Haar)

def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def dwt_values(x: np.ndarray, l: int) -> np.ndarray:
    """Orthonormal Haar DWT of the zero-padded-to-pow2 series; first l
    coefficients in (approximation, detail-coarse→fine) order."""
    n2 = _next_pow2(len(x))
    buf = np.zeros(n2)
    buf[: len(x)] = x
    coefs: list[np.ndarray] = []
    cur = buf
    while len(cur) > 1:
        even, odd = cur[0::2], cur[1::2]
        detail = (even - odd) / np.sqrt(2.0)
        cur = (even + odd) / np.sqrt(2.0)
        coefs.append(detail)
    ordered = np.concatenate([cur] + coefs[::-1])
    return ordered[:l]


def dwt_inverse(coefs: np.ndarray, n: int) -> np.ndarray:
    n2 = _next_pow2(n)
    full = np.zeros(n2)
    full[: len(coefs)] = coefs
    cur = full[:1]
    pos = 1
    while len(cur) < n2:
        detail = full[pos : pos + len(cur)]
        even = (cur + detail) / np.sqrt(2.0)
        odd = (cur - detail) / np.sqrt(2.0)
        nxt = np.empty(2 * len(cur))
        nxt[0::2] = even
        nxt[1::2] = odd
        pos += len(cur)
        cur = nxt
    return cur[:n]


def dwt_lb_distance(a: np.ndarray, b: np.ndarray, n: int) -> float:
    """Orthonormal transform → partial-coefficient distance ≤ ED."""
    return float(np.sqrt(((a - b) ** 2).sum()))


# ---------------------------------------------------------------- APCA

def apca_values(x: np.ndarray, l: int) -> np.ndarray:
    """Adaptive piecewise-constant: l/2 (value, end) pairs, interleaved
    [v0, end0, v1, end1, …] with end = inclusive right index.

    Greedy bottom-up merge (the reference reaches the same segment
    count via Haar thresholding + merging; we run the merge directly —
    same output shape and invariants, simpler control flow)."""
    n = len(x)
    k = max(1, l // 2)
    # start from unit segments, greedily merge the pair whose merge
    # increases reconstruction error least
    bounds = [(i, i + 1) for i in range(n)]  # [lo, hi)
    sums = x.astype(np.float64).copy()
    sqs = (x.astype(np.float64) ** 2).copy()
    segs = [
        {"lo": i, "hi": i + 1, "s": sums[i], "q": sqs[i]} for i in range(n)
    ]

    def err(s):
        m = s["hi"] - s["lo"]
        # s*s, not s**2: libm pow() is not guaranteed to be the exact
        # product, and the DuckDB property-oracle recomputes this cost
        # bit-for-bit with s*s — argmin decisions must agree exactly
        return s["q"] - s["s"] * s["s"] / m

    while len(segs) > k:
        best_i, best_cost = -1, np.inf
        for i in range(len(segs) - 1):
            a, b = segs[i], segs[i + 1]
            merged = {
                "lo": a["lo"], "hi": b["hi"],
                "s": a["s"] + b["s"], "q": a["q"] + b["q"],
            }
            cost = err(merged) - err(a) - err(b)
            if cost < best_cost:
                best_cost, best_i = cost, i
        a, b = segs[best_i], segs[best_i + 1]
        segs[best_i : best_i + 2] = [
            {"lo": a["lo"], "hi": b["hi"], "s": a["s"] + b["s"], "q": a["q"] + b["q"]}
        ]
    out = np.zeros(2 * k)
    for i, s in enumerate(segs):
        out[2 * i] = s["s"] / (s["hi"] - s["lo"])
        out[2 * i + 1] = s["hi"] - 1
    return out


def apca_inverse(coefs: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros(n)
    lo = 0
    for i in range(len(coefs) // 2):
        hi = int(coefs[2 * i + 1]) + 1
        out[lo:hi] = coefs[2 * i]
        lo = hi
    return out


def apca_lb_distance(query_raw: np.ndarray, cand: np.ndarray, n: int) -> float:
    """Asymmetric APCA lower bound (the reference getDistance also takes
    the ORIGINAL query, APCA.java:201-272 / Representation.java:17-45):
    project the raw query onto the CANDIDATE's segmentation (per-segment
    means) and walk the intervals — a projection is an L2 contraction,
    so √Σ len·(q̄_seg − c_seg)² ≤ ED(query, candidate)."""
    lo = 0
    total = 0.0
    for i in range(len(cand) // 2):
        hi = int(cand[2 * i + 1]) + 1
        seg = query_raw[lo:hi]
        if len(seg):
            total += len(seg) * (seg.mean() - cand[2 * i]) ** 2
        lo = hi
    return float(np.sqrt(total))


# ---------------------------------------------------------------- Spark wrappers

_KERNELS = {
    "paa": paa_values,
    "pla": pla_values,
    "dwt": dwt_values,
    "apca": apca_values,
}


def transform(arrays: DataFrame, kind: str, l: int) -> DataFrame:
    """(series_id, values) → (series_id, coefs array<double>) for any
    registered representation — one Arrow batch per partition."""
    kernel = _KERNELS[kind]

    @pandas_udf("array<double>")
    def _t(vals: pd.Series) -> pd.Series:
        return vals.map(lambda v: kernel(np.asarray(v, dtype=np.float64), l).tolist())

    return arrays.select("series_id", _t("values").alias("coefs"))
