"""ν-one-class SVM (RBF) — the TEASER master model, in pure numpy.

Reference: TEASERClassifier.fitSVM / initSVMParameters
(`/root/reference/src/main/java/sfa/classification/TEASERClassifier.java:197-238,365-376`)
uses libsvm's ONE_CLASS solver (RBF, ν=0.05, eps=1e-4) with a gamma
grid {100, 10, 9, ..., 1.5, 1} chosen by 10-fold CV on the acceptance
rate, folds shuffled with java.util.Random(1).

This environment has no libsvm/sklearn, and the master's training set
is tiny by construction (#correctly-classified train samples ×
(#classes + 1) features), so the dual is solved on the driver with a
plain SMO — the same pair-selection rule libsvm uses. The distributed
part of TEASER (slave transforms, scoring) stays in Spark; only this
grid-sized solve is local, exactly like the reference's single-node
libsvm call.

Dual (Schölkopf one-class):  min ½ αᵀQα,  0 ≤ α ≤ 1,  Σα = νl
decision(x) = Σ α_i K(x_i, x) − ρ ≥ 0 → accept (+1).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


def rbf_kernel(a: np.ndarray, b: np.ndarray, gamma: float) -> np.ndarray:
    aa = (a * a).sum(axis=1)[:, None]
    bb = (b * b).sum(axis=1)[None, :]
    d2 = np.maximum(aa + bb - 2.0 * (a @ b.T), 0.0)
    return np.exp(-gamma * d2)


@dataclass
class OneClassSVM:
    support: np.ndarray  # support vectors
    alpha: np.ndarray  # their dual coefficients
    rho: float
    gamma: float

    def decision(self, x: np.ndarray) -> np.ndarray:
        k = rbf_kernel(np.atleast_2d(x), self.support, self.gamma)
        return k @ self.alpha - self.rho

    def predict(self, x: np.ndarray) -> np.ndarray:
        """+1 accept / −1 reject, libsvm sign convention (ties → −1:
        libsvm predicts +1 only for decision > 0)."""
        return np.where(self.decision(x) > 0, 1.0, -1.0)


def fit_one_class(
    x: np.ndarray, nu: float = 0.05, gamma: float = 1.0, eps: float = 1e-4,
    max_iter: int = 100_000,
) -> OneClassSVM:
    """SMO for the one-class dual, libsvm's initialization (the first
    ⌊νl⌋ points get α=1, the next the fractional remainder —
    svm.cpp solve_one_class) and maximal-violating-pair selection."""
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    l = len(x)
    q = rbf_kernel(x, x, gamma)
    alpha = np.zeros(l)
    n = int(nu * l)
    alpha[:n] = 1.0
    if n < l:
        alpha[n] = nu * l - n
    g = q @ alpha  # gradient of ½αᵀQα

    for _ in range(max_iter):
        up = alpha < 1.0 - 1e-12  # can increase
        dn = alpha > 1e-12  # can decrease
        if not up.any() or not dn.any():
            break
        i = np.where(up)[0][np.argmin(g[up])]
        j = np.where(dn)[0][np.argmax(g[dn])]
        if g[j] - g[i] < eps:
            break
        quad = q[i, i] + q[j, j] - 2.0 * q[i, j]
        if quad <= 0:
            quad = 1e-12
        delta = (g[j] - g[i]) / quad
        delta = min(delta, 1.0 - alpha[i], alpha[j])
        if delta <= 0:
            break
        alpha[i] += delta
        alpha[j] -= delta
        g += delta * (q[:, i] - q[:, j])

    free = (alpha > 1e-12) & (alpha < 1.0 - 1e-12)
    if free.any():
        rho = float(g[free].mean())
    else:
        lo = g[alpha >= 1.0 - 1e-12]
        hi = g[alpha <= 1e-12]
        lo_m = lo.max() if len(lo) else -np.inf
        hi_m = hi.min() if len(hi) else np.inf
        rho = float((lo_m + hi_m) / 2.0) if np.isfinite(lo_m + hi_m) else float(g.mean())
    sv = alpha > 1e-12
    return OneClassSVM(support=x[sv], alpha=alpha[sv], rho=rho, gamma=gamma)


class JavaRandom:
    """java.util.Random LCG — replicates the reference's fold shuffle
    (Classifier.trainSVMOneClass uses new Random(1))."""

    def __init__(self, seed: int):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound <= 0:
            raise ValueError("bound must be positive")
        if (bound & -bound) == bound:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) < (1 << 31):
                return val


SVM_GAMMAS = (100.0, 10.0, 9.0, 8.0, 7.0, 6.0, 5.0, 4.0, 3.0, 2.0, 1.5, 1.0)


def cv_accept_rate(
    x: np.ndarray, nu: float, gamma: float, n_folds: int = 10
) -> float:
    """10-fold CV acceptance rate with the reference's java-Random(1)
    permutation and contiguous fold slicing (Classifier.java:439-505)."""
    l = len(x)
    if l == 0:
        return 0.0
    rand = JavaRandom(1)
    perm = list(range(l))
    for i in range(l):
        j = i + rand.next_int(l - i)
        perm[i], perm[j] = perm[j], perm[i]
    folds = min(n_folds, l)
    fold_start = [i * l // folds for i in range(folds + 1)]
    accepted = 0
    for s in range(folds):
        te = perm[fold_start[s] : fold_start[s + 1]]
        tr = perm[: fold_start[s]] + perm[fold_start[s + 1] :]
        if not tr or not te:
            continue
        m = fit_one_class(x[tr], nu=nu, gamma=gamma)
        accepted += int((m.predict(x[te]) > 0).sum())
    return accepted / l


def fit_master(
    features: np.ndarray, nu: float = 0.05, gammas=SVM_GAMMAS
) -> OneClassSVM:
    """Gamma-grid selection by CV acceptance rate (strict >, first
    gamma wins ties — the reference grid order), final fit on all
    data (TEASERClassifier.fitSVM)."""
    features = np.atleast_2d(np.asarray(features, dtype=np.float64))
    best_gamma, best_rate = gammas[0], -1.0
    for gamma in gammas:
        rate = cv_accept_rate(features, nu, gamma)
        if rate > best_rate:
            best_rate, best_gamma = rate, gamma
    return fit_one_class(features, nu=nu, gamma=best_gamma)


def master_features(probs: np.ndarray) -> np.ndarray:
    """Per-sample master features: the class-probability vector plus
    minDiff = max prob − closest other prob
    (TEASERClassifier.generateFeatures/getMinDiff java:405-444)."""
    probs = np.atleast_2d(np.asarray(probs, dtype=np.float64))
    mx = probs.max(axis=1, keepdims=True)
    arg = probs.argmax(axis=1)
    masked = probs.copy()
    masked[np.arange(len(probs)), arg] = -np.inf
    min_diff = np.minimum(1.0, (mx[:, 0] - masked.max(axis=1)))
    return np.hstack([probs, min_diff[:, None]])
