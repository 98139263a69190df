"""Driver-local multinomial logistic regression (softmax + L2, L-BFGS).

The reference trains WEASEL's linear model with a SINGLE-NODE liblinear
call over the (tiny) train matrix (WEASELClassifier.java:31-36,214-263)
— the distributed part of its pipeline is the featurization, not the
solve. Mirroring that split is also the right Spark architecture: the
bag-of-keys featurization and the scoring join stay distributed, while
the #train × vocab solve (30 × 250k for the bundled fixtures) runs on
the driver in numpy. Using MLlib LogisticRegression here costs ~1
treeAggregate JOB per L-BFGS iteration (100k scheduler round-trips for
a 10-fold × 4-combo × 20-snapshot TEASER fit) to move kilobytes.

Objective (MLlib parity, standardization=False, fitIntercept=True):
    f(W, b) = (1/n) Σ_i CE(softmax(W x_i + b), y_i) + λ · ½‖W‖²
with the intercept unregularized and λ = 1/(C·n) for liblinear C.
"""

from __future__ import annotations

import numpy as np

# Above this estimated dense-matrix size the featurized bags stay
# sparse through the L-BFGS matvecs (the χ² cap bounds vocab, but
# #train × vocab can still exceed driver memory at 10⁶ labeled series
# — the r2 verdict's driver-dense-matrix ceiling). Below it, dense
# BLAS is faster and keeps the small-fixture goldens bit-stable.
DENSE_BUDGET_BYTES = 256 << 20


class CooRows:
    """Row-major sparse matrix as COO index arrays — no scipy, just
    numpy bincount matvecs: exactly the two products the softmax
    objective needs (X·Wᵀ and Gᵀ·X). Bag featurizations are naturally
    this shape ((series, key, cnt) rows), so keeping them sparse makes
    driver memory ∝ nnz, not #train × vocab."""

    def __init__(self, rows, cols, vals, shape, _checked=False):
        self.rows = np.asarray(rows, dtype=np.int64)
        self.cols = np.asarray(cols, dtype=np.int64)
        self.vals = np.asarray(vals, dtype=np.float64)
        self.shape = (int(shape[0]), int(shape[1]))
        # the bincount matvecs SUM duplicate (row, col) entries while
        # toarray()/the dense-gated paths OVERWRITE them — refuse
        # non-aggregated input so the size gate can't change the model.
        # Row slices of a checked matrix stay unique (_checked skips the
        # O(nnz log nnz) re-sort on every CV fold split).
        if not _checked and len(self.rows):
            key = self.rows * self.shape[1] + self.cols
            assert len(np.unique(key)) == len(key), (
                "CooRows requires aggregated (row, col) pairs — duplicates "
                "would sum in sparse matvecs but overwrite in dense paths"
            )

    @property
    def nnz(self) -> int:
        return len(self.vals)

    def dot_wt(self, W: np.ndarray) -> np.ndarray:
        """X @ W.T → (n, k)."""
        n, _ = self.shape
        k = W.shape[0]
        Z = np.empty((n, k), dtype=np.float64)
        for j in range(k):
            Z[:, j] = np.bincount(
                self.rows, weights=self.vals * W[j, self.cols], minlength=n
            )
        return Z

    def gt_dot(self, G: np.ndarray) -> np.ndarray:
        """G.T @ X → (k, d)."""
        _, d = self.shape
        k = G.shape[1]
        out = np.empty((k, d), dtype=np.float64)
        for j in range(k):
            out[j] = np.bincount(
                self.cols, weights=self.vals * G[self.rows, j], minlength=d
            )
        return out

    def __getitem__(self, mask):
        """Boolean row selection (the CV fold splits)."""
        mask = np.asarray(mask)
        assert mask.dtype == bool and len(mask) == self.shape[0]
        new_row = np.cumsum(mask) - 1
        keep = mask[self.rows]
        return CooRows(
            new_row[self.rows[keep]],
            self.cols[keep],
            self.vals[keep],
            (int(mask.sum()), self.shape[1]),
            _checked=True,
        )

    def toarray(self) -> np.ndarray:
        X = np.zeros(self.shape, dtype=np.float64)
        X[self.rows, self.cols] = self.vals
        return X


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def _x_dot_wt(X, W):
    return X.dot_wt(W) if isinstance(X, CooRows) else X @ W.T


def _fun_grad(theta, X, Y, lam, k, d):
    """Loss and gradient. theta packs [W (k×d), b (k)]. X may be a
    dense ndarray or CooRows — only the two matvecs differ."""
    n = X.shape[0]
    W = theta[: k * d].reshape(k, d)
    b = theta[k * d :]
    P = _softmax(_x_dot_wt(X, W) + b)
    # cross-entropy; Y is one-hot (n×k)
    eps = 1e-15
    f = -np.log(np.maximum((P * Y).sum(axis=1), eps)).mean()
    f += lam * 0.5 * float((W * W).sum())
    G = (P - Y) / n  # n×k
    gW = (X.gt_dot(G) if isinstance(X, CooRows) else G.T @ X) + lam * W
    gb = G.sum(axis=0)
    return f, np.concatenate([gW.ravel(), gb])


def _lbfgs(fun_grad, x0, max_iter=100, tol=1e-7, m=10):
    """Two-loop-recursion L-BFGS with Armijo backtracking — the same
    family of solver MLlib/breeze uses, sized for driver-local data."""
    x = x0.copy()
    f, g = fun_grad(x)
    s_list, y_list, rho_list = [], [], []
    for _ in range(max_iter):
        q = g.copy()
        alphas = []
        for s, y, rho in zip(reversed(s_list), reversed(y_list), reversed(rho_list)):
            a = rho * (s @ q)
            alphas.append(a)
            q -= a * y
        if y_list:
            ys = y_list[-1] @ s_list[-1]
            yy = y_list[-1] @ y_list[-1]
            q *= ys / max(yy, 1e-30)
        for (s, y, rho), a in zip(zip(s_list, y_list, rho_list), reversed(alphas)):
            beta = rho * (y @ q)
            q += (a - beta) * s
        p = -q
        gp = g @ p
        if gp > 0:  # not a descent direction — restart from steepest
            p = -g
            gp = -(g @ g)
        step = 1.0
        f_new, g_new = fun_grad(x + step * p)
        while f_new > f + 1e-4 * step * gp and step > 1e-12:
            step *= 0.5
            f_new, g_new = fun_grad(x + step * p)
        if step <= 1e-12:
            break
        s_vec = step * p
        y_vec = g_new - g
        sy = s_vec @ y_vec
        if sy > 1e-12:
            s_list.append(s_vec)
            y_list.append(y_vec)
            rho_list.append(1.0 / sy)
            if len(s_list) > m:
                s_list.pop(0)
                y_list.pop(0)
                rho_list.pop(0)
        x = x + s_vec
        if abs(f - f_new) <= tol * max(abs(f), abs(f_new), 1.0):
            f, g = f_new, g_new
            break
        f, g = f_new, g_new
    return x


class OvrLR:
    """One-vs-rest L2R_LR bundle: W (k×d), b (k) with b already scaled
    by the bias value (decision_c = W_c·x + b_c). Probabilities follow
    Linear.predictProbability: per-class sigmoid, then normalize —
    NOT a softmax. predict_idx = argmax decision (first max wins), the
    reference's predictValues tie-break."""

    def __init__(self, W: np.ndarray, b: np.ndarray):
        self.W, self.b = W, b

    def _dec(self, X) -> np.ndarray:
        if isinstance(X, CooRows):
            return X.dot_wt(self.W) + self.b
        return np.atleast_2d(X) @ self.W.T + self.b

    def predict_proba(self, X) -> np.ndarray:
        p = 1.0 / (1.0 + np.exp(-self._dec(X)))
        return p / p.sum(axis=1, keepdims=True)

    def predict_idx(self, X) -> np.ndarray:
        return self._dec(X).argmax(axis=1)


class _L2rLrFun:
    """liblinear's l2r_lr_fun on the bias-augmented design: value,
    gradient, Hessian-vector product of
        f(θ) = ½ θᵀθ + C Σᵢ log(1 + exp(−yᵢ·(w·xᵢ + θ_b·bias))).
    X may be dense or CooRows (both matvec directions available)."""

    def __init__(self, X, ysign, C, bias):
        self.X, self.y, self.C, self.bias = X, ysign, C, bias

    def _xv(self, theta):
        w, wb = theta[:-1], theta[-1]
        z = (
            self.X.dot_wt(w[None, :])[:, 0]
            if isinstance(self.X, CooRows)
            else self.X @ w
        )
        return z + wb * self.bias

    def _xtv(self, v):
        g = (
            self.X.gt_dot(v[:, None])[0]
            if isinstance(self.X, CooRows)
            else v @ self.X
        )
        return np.concatenate([g, [v.sum() * self.bias]])

    def fun(self, theta):
        yz = self.y * self._xv(theta)
        self._sig = np.exp(-np.logaddexp(0.0, -yz))  # σ(yz), cached
        return 0.5 * (theta @ theta) + self.C * np.logaddexp(0.0, -yz).sum()

    def grad(self, theta):
        # liblinear reuses the σ(yz) computed by the preceding fun()
        sig = self._sig
        self._D = sig * (1.0 - sig)
        return theta + self.C * self._xtv((sig - 1.0) * self.y)

    def hv(self, v):
        xv = self._xv(v)
        return v + self.C * self._xtv(self._D * xv)

    def diag_preconditioner(self):
        """Hessian diagonal: 1 + C·Σᵢ Dᵢ·xᵢⱼ² (l2r_lr_fun::
        get_diag_preconditioner); uses D from the last grad() call."""
        if isinstance(self.X, CooRows):
            d = np.zeros(self.X.shape[1])
            np.add.at(d, self.X.cols, self._D[self.X.rows] * self.X.vals**2)
        else:
            d = self._D @ (self.X * self.X)
        return 1.0 + self.C * np.concatenate([d, [self._D.sum() * self.bias**2]])


def _uTMv(u, M, v):
    return float((u * M * v).sum())


def _trpcg(fun_obj, delta, g, M):
    """liblinear 2.30 TRON's inner PRECONDITIONED conjugate-gradient
    solve (tron.cpp trpcg): z = M⁻¹r updates, trust region measured in
    the M-norm, boundary projection in M-norm. Returns (s, r,
    reach_boundary). liblinear-java 2.30 — the exact artifact the
    reference pins (build.gradle:56) — is the line-for-line port."""
    s = np.zeros_like(g)
    r = -g
    z = r / M
    d = z.copy()
    ztr = float(z @ r)
    cgtol = 0.1 * np.sqrt(ztr)
    reach_boundary = False
    while True:
        if np.sqrt(ztr) <= cgtol:
            break
        hd = fun_obj.hv(d)
        alpha = ztr / float(d @ hd)
        s += alpha * d
        if np.sqrt(_uTMv(s, M, s)) > delta:
            reach_boundary = True
            s -= alpha * d
            stmd = _uTMv(s, M, d)
            stms = _uTMv(s, M, s)
            dtmd = _uTMv(d, M, d)
            dsq = delta * delta
            rad = np.sqrt(stmd * stmd + dtmd * (dsq - stms))
            alpha = (dsq - stms) / (stmd + rad) if stmd >= 0 else (rad - stmd) / dtmd
            s += alpha * d
            r -= alpha * hd
            break
        r -= alpha * hd
        z = r / M
        znew = float(z @ r)
        d = z + (znew / ztr) * d
        ztr = znew
    return s, r, reach_boundary


def _tron(fun_obj, n_dim, eps_stop, max_iter=1000):
    """Trust-region Newton with diagonal preconditioning — the exact
    solver/δ schedule of liblinear 2.30's TRON (tron.cpp; PCG per
    Hsia/Chiang/Lin ACML'18, α_pcg = 0.01). Trajectory parity matters
    because the reference runs it far from convergence (eps=0.1,
    WEASELClassifier.java:34) and TEASER's one-class master is
    calibrated on the under-converged probabilities."""
    eta0, eta1, eta2 = 1e-4, 0.25, 0.75
    sigma1, sigma2, sigma3 = 0.25, 0.5, 4.0
    alpha_pcg = 0.01
    w = np.zeros(n_dim)
    f = fun_obj.fun(w)
    g = fun_obj.grad(w)
    gnorm0 = float(np.linalg.norm(g))
    if gnorm0 <= eps_stop * gnorm0:  # only when ‖g(0)‖ == 0
        return w
    M = (1 - alpha_pcg) + alpha_pcg * fun_obj.diag_preconditioner()
    delta = np.sqrt(_uTMv(g, M, g))
    it = 1
    delta_adjusted = False
    while it <= max_iter:
        s, r, reach_boundary = _trpcg(fun_obj, delta, g, M)
        w_new = w + s
        gs = float(g @ s)
        prered = -0.5 * (gs - float(s @ r))
        fnew = fun_obj.fun(w_new)
        actred = f - fnew
        s_mnorm = np.sqrt(_uTMv(s, M, s))
        if it == 1 and not delta_adjusted:
            delta = min(delta, s_mnorm)
            delta_adjusted = True
        if fnew - f - gs <= 0:
            alpha = sigma3
        else:
            alpha = max(sigma1, -0.5 * (gs / (fnew - f - gs)))
        if actred < eta0 * prered:
            delta = min(alpha * s_mnorm, sigma2 * delta)
        elif actred < eta1 * prered:
            delta = max(sigma1 * delta, min(alpha * s_mnorm, sigma2 * delta))
        elif actred < eta2 * prered:
            delta = max(sigma1 * delta, min(alpha * s_mnorm, sigma3 * delta))
        else:
            if reach_boundary:
                delta = sigma3 * delta
            else:
                delta = max(delta, min(alpha * s_mnorm, sigma3 * delta))
        if actred > eta0 * prered:
            it += 1
            w = w_new
            f = fnew
            g = fun_obj.grad(w)
            M = (1 - alpha_pcg) + alpha_pcg * fun_obj.diag_preconditioner()
            if float(np.linalg.norm(g)) <= eps_stop * gnorm0:
                break
        else:
            # rejected step: fun/grad caches belong to w_new — re-prime
            # them at w before the next trpcg (liblinear evaluates
            # fun+grad only on acceptance, so its caches still hold w)
            fun_obj.fun(w)
            fun_obj.grad(w)
        if f < -1.0e32:
            break
        if prered <= 0:
            break
        if abs(actred) <= 1.0e-12 * abs(f) and abs(prered) <= 1.0e-12 * abs(f):
            break
    return w


def fit_ovr_lr(
    X,
    y_idx: np.ndarray,
    n_classes: int,
    C: float = 1.0,
    bias: float = 1.0,
    max_iter: int = 1000,
    eps: float = 1e-8,
) -> OvrLR:
    """liblinear-parity multiclass L2R_LR fit via the TRON port above.

    Convergence note: the reference runs liblinear with eps = 0.1
    (WEASELClassifier.java:34), i.e. TRON stops at
    ‖g‖ ≤ eps·max(min(pos,neg),1)/l·‖g(0)‖ — an under-converged iterate
    whose exact position depends on liblinear's float trajectory and is
    NOT reproducible by a re-implementation (measured: our own TRON
    stopped at the same rule moved TEASER earliness AWAY from the
    published values — CBF 0.641→0.714 — while an L-BFGS stopped there
    collapsed Coffee accuracy outright). We therefore default to the
    solver-independent unique optimum (eps = 1e-8), which measured
    INSIDE the reference's ±0.05 earliness bands; pass eps=0.1 to get
    liblinear's literal stopping rule.
    k=2 trains ONE binary like liblinear (nr_class==2 branch) and
    mirrors the weights (sign-symmetric objective ⇒ exactly −w); k>2
    trains independent OvR binaries, order-immaterial."""
    if not isinstance(X, CooRows):
        X = np.atleast_2d(np.asarray(X, dtype=np.float64))
    n, d = X.shape
    y_idx = np.asarray(y_idx, dtype=np.int64)
    k = int(n_classes)
    W = np.zeros((k, d))
    b = np.zeros(k)

    def _solve(ysign):
        pos = int((ysign > 0).sum())
        tol = eps * max(min(pos, n - pos), 1) / max(n, 1)
        theta = _tron(_L2rLrFun(X, ysign, C, bias), d + 1, tol, max_iter)
        return theta[:-1], theta[-1] * bias

    if k == 2:
        w0, b0 = _solve(np.where(y_idx == 0, 1.0, -1.0))
        W[0], b[0] = w0, b0
        W[1], b[1] = -w0, -b0
        return OvrLR(W, b)
    for c in range(k):
        W[c], b[c] = _solve(np.where(y_idx == c, 1.0, -1.0))
    return OvrLR(W, b)


class LocalSoftmax:
    """Fitted model: W (k×d), b (k); predict_proba on dense or CooRows."""

    def __init__(self, W: np.ndarray, b: np.ndarray):
        self.W, self.b = W, b

    def predict_proba(self, X) -> np.ndarray:
        if isinstance(X, CooRows):
            return _softmax(X.dot_wt(self.W) + self.b)
        return _softmax(np.atleast_2d(X) @ self.W.T + self.b)

    def predict_idx(self, X) -> np.ndarray:
        return self.predict_proba(X).argmax(axis=1)


def fit_softmax(
    X,
    y_idx: np.ndarray,
    n_classes: int,
    lam: float,
    max_iter: int = 100,
    tol: float = 1e-7,
) -> LocalSoftmax:
    if not isinstance(X, CooRows):
        X = np.atleast_2d(np.asarray(X, dtype=np.float64))
    n, d = X.shape
    k = int(n_classes)
    Y = np.zeros((n, k))
    Y[np.arange(n), np.asarray(y_idx, dtype=np.int64)] = 1.0
    theta0 = np.zeros(k * d + k)
    theta = _lbfgs(
        lambda t: _fun_grad(t, X, Y, lam, k, d), theta0,
        max_iter=max_iter, tol=tol,
    )
    return LocalSoftmax(theta[: k * d].reshape(k, d), theta[k * d :])
