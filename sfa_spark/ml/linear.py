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


def _ovr_fun_grad(theta, X, ysign, C, bias):
    """liblinear L2R_LR primal for ONE one-vs-rest subproblem:
        f(w) = ½(wᵀw + w_b²) + C Σ_i log(1 + exp(−y_i·(w·x_i + w_b·bias)))
    The bias enters as an appended feature of value `bias`, so its
    weight IS regularized — unlike fit_softmax's free intercept. This
    is the calibration TEASER's slaves need (TEASERClassifier.java:46
    forces SolverType.L2R_LR; WEASELClassifier.java:33 bias = 1)."""
    w, wb = theta[:-1], theta[-1]
    z = (X.dot_wt(w[None, :])[:, 0] if isinstance(X, CooRows) else X @ w) + wb * bias
    yz = ysign * z
    # stable log(1+exp(-yz)) and σ(-yz) = exp(-logaddexp(0, yz))
    loss = np.logaddexp(0.0, -yz)
    sig = np.exp(-np.logaddexp(0.0, yz))
    f = 0.5 * (w @ w + wb * wb) + C * loss.sum()
    coef = -C * ysign * sig  # dL/dz
    gw = (
        X.gt_dot(coef[:, None])[0] if isinstance(X, CooRows) else coef @ X
    ) + w
    gb = wb + coef.sum() * bias
    return f, np.concatenate([gw, [gb]])


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


def fit_ovr_lr(
    X,
    y_idx: np.ndarray,
    n_classes: int,
    C: float = 1.0,
    bias: float = 1.0,
    max_iter: int = 200,
    tol: float = 1e-9,
) -> OvrLR:
    """liblinear-parity multiclass fit: one binary L2R_LR per class
    (converged primal ≡ the unique optimum liblinear's TRON/dual
    approach; both solvers are deterministic for this solver type).
    Class order is immaterial for k>2 (independent subproblems) and for
    k=2 the two sign-flipped optima yield identical normalized
    probabilities."""
    if not isinstance(X, CooRows):
        X = np.atleast_2d(np.asarray(X, dtype=np.float64))
    n, d = X.shape
    y_idx = np.asarray(y_idx, dtype=np.int64)
    W = np.zeros((int(n_classes), d))
    b = np.zeros(int(n_classes))
    for c in range(int(n_classes)):
        ysign = np.where(y_idx == c, 1.0, -1.0)
        theta = _lbfgs(
            lambda t: _ovr_fun_grad(t, X, ysign, C, bias),
            np.zeros(d + 1),
            max_iter=max_iter,
            tol=tol,
        )
        W[c] = theta[:-1]
        b[c] = theta[-1] * bias
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
