"""TEASER with WEASEL slaves and a ν-one-class-SVM master — the
reference's exact architecture (SURVEY §2.7 C9-C10, M6).

Reference: TEASERClassifier
(`/root/reference/src/main/java/sfa/classification/TEASERClassifier.java`):
  * S snapshots; offsets[s] = round(max_len/S · s), slaves trained on
    train prefixes (java:138-162), slave = full WEASEL with
    lowerBounding=true (java:43-48)
  * master per snapshot: ν-one-class SVM (RBF, ν=0.05, gamma grid by
    10-fold CV) on the (class-probability, minDiff) feature vectors of
    the CORRECTLY classified train samples (fitSVM java:197-238)
  * threshold v ∈ 2..5 by harmonic mean of train accuracy and
    earliness, where the train evaluation transforms the FULL series
    through each snapshot's slave (extractUntilOffset(testing=false),
    java:163-186,245-255)
  * decide (java:272-339): walking snapshots in order, an ACCEPTED
    (svm says +1) prediction extends a streak only while the label
    repeats — a rejected snapshot does NOT reset the streak — and the
    series is decided when the streak reaches v, or forced at the last
    snapshot / when the offset covers the series.

Spark shape: slave fits are the grid-as-data WEASEL (ml/grid.py); the
master solve is driver-side numpy over a (#correct × #classes+1)
matrix — the same single-node libsvm call the reference makes. The
decide pass is one window-function cascade over the
(series × snapshot) score frame: no driver loop over series.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sfa_spark.ml import grid, oneclass


def java_norm_expr(v):
    """Column expr: z-normalize an array the way TimeSeries.norm()
    does (TimeSeries.java:77-116): population σ = √max(0, E[x²]−μ²),
    subtract μ always, scale by 1/σ only when σ ≠ 0. Sequential array
    folds match Java's left-to-right summation order bit-for-bit."""
    n = F.size(v).cast("double")
    mean = F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / n
    ex2 = F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x) / n
    var = ex2 - mean * mean
    std = F.when(var > 0, F.sqrt(var)).otherwise(F.lit(0.0))
    inv = F.when(std != 0.0, F.lit(1.0) / std).otherwise(F.lit(1.0))
    return F.transform(v, lambda x: (x - mean) * inv)


def _prefix(arrays: DataFrame, plen: int) -> DataFrame:
    """Truncate to `plen` AND re-z-normalize the prefix — the reference
    extracts snapshots with TimeSeries.getSubsequence, which constructs
    a fresh TimeSeries and calls norm() on it (TimeSeries.java:177-182),
    so every truncated snapshot is normalized to its OWN prefix stats,
    not the full-series stats the loader normalized with."""
    return arrays.select(
        "series_id", java_norm_expr(F.slice("values", 1, int(plen))).alias("values")
    )


@dataclass
class TeaserWeaselModel:
    snapshots: list[int]  # snapshot ids s (ascending)
    offsets: dict[int, int]
    slaves: dict[int, grid.WeaselGridModel]
    masters: dict[int, oneclass.OneClassSVM]
    threshold: int
    s_max: int
    n_classes: int


def _accept_col(master: oneclass.OneClassSVM):
    """pandas UDF: probability array → svm accept flag. The support-
    vector matrix is tiny (ν·#train rows), closed over and shipped to
    executors — scoring stays distributed."""
    from pyspark.sql.functions import pandas_udf

    sv, al, rho, gamma = master.support, master.alpha, master.rho, master.gamma

    @pandas_udf("boolean")
    def _acc(probs: pd.Series) -> pd.Series:
        x = np.vstack(probs.to_numpy())
        feats = oneclass.master_features(x)
        k = oneclass.rbf_kernel(feats, sv, gamma)
        return pd.Series((k @ al - rho) > 0)

    return _acc


def _snapshot_frame(
    model: TeaserWeaselModel, arrays: DataFrame, testing: bool
) -> DataFrame:
    """(series_id, s, pred_label, accepted, offset, n) for every
    snapshot with a master. testing=True truncates to the snapshot
    prefix; the train-time threshold search uses full series
    (reference extractUntilOffset)."""
    lens = arrays.select("series_id", F.size("values").alias("n"))
    parts = []
    for s in model.snapshots:
        data = _prefix(arrays, model.offsets[s]) if testing else arrays
        proba = model.slaves[s].predict_proba(data)
        acc = _accept_col(model.masters[s])
        parts.append(
            proba.select(
                "series_id",
                F.lit(s).alias("s"),
                "pred_label",
                acc("probs").alias("accepted"),
                F.lit(model.offsets[s]).alias("offset"),
            )
        )
    snap = parts[0]
    for p in parts[1:]:
        snap = snap.unionByName(p)
    return snap.join(lens, "series_id")


def _decide(snap: DataFrame, v: int, s_max: int) -> DataFrame:
    """First snapshot where the accepted same-label streak reaches v,
    else forced at the last snapshot (or when the offset covers the
    series). Output: (series_id, pred_label, earliness)."""
    forced = (F.col("s") >= s_max) | (F.col("offset") >= F.col("n"))
    elig = snap.withColumn("forced", forced).where(
        F.col("accepted") | F.col("forced")
    )
    w = Window.partitionBy("series_id").orderBy("s")
    chg = (
        F.when(F.lag("pred_label").over(w).isNull(), F.lit(1))
        .when(F.col("pred_label") != F.lag("pred_label").over(w), F.lit(1))
        .otherwise(F.lit(0))
    )
    runs = elig.withColumn("chg", chg).withColumn(
        "run", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    streak = F.row_number().over(
        Window.partitionBy("series_id", "run").orderBy("s")
    )
    decided = runs.withColumn("streak", streak).where(
        (F.col("streak") >= v) | F.col("forced")
    )
    first = Window.partitionBy("series_id").orderBy("s")
    return (
        decided.withColumn("rk", F.row_number().over(first))
        .where(F.col("rk") == 1)
        .select(
            "series_id",
            "pred_label",
            F.least(F.lit(1.0), F.col("offset") / F.col("n")).alias("earliness"),
        )
    )


def teaser_weasel_fit(
    train_arrays: DataFrame,
    labels: DataFrame,
    s_total: int = 20,
    v_grid: tuple[int, ...] = (2, 3, 4, 5),
    nu: float = 0.05,
    max_offset: int = 250,
    weasel_kw: dict | None = None,
) -> TeaserWeaselModel:
    """Fit TEASER (reference fitTeaser, java:138-195). weasel_kw tunes
    the slave fits (n_folds/max_iter) for test budgets."""
    kw = dict(weasel_kw or {})
    kw.setdefault("lower_bounding", True)  # TEASERClassifier ctor
    # the SAME 250 constant also caps the slave window grid
    # (TEASERClassifier ctor sets WEASELClassifier.MAX_WINDOW_LENGTH =
    # 250, java:47) — moot once offsets are capped at 250 too, but kept
    # for callers that raise max_offset
    kw.setdefault("max_windows", max_offset)
    # TEASERClassifier ctor forces SolverType.L2R_LR (java:46): slave
    # probabilities are OvR sigmoids normalized (Linear.
    # predictProbability), NOT a softmax — the calibration the one-class
    # master's accept threshold was published against
    kw.setdefault("prob_mode", "liblinear_lr")
    lab = labels.select("series_id", "label")
    # loader parity: the reference z-norms every full series at load
    # (TimeSeriesLoader.java:72). Prefix snapshots are re-normed to
    # their own stats by _prefix either way (affine-invariant), but the
    # threshold search below scores FULL series (testing=false), so
    # norm them here once — idempotent when the input is already normed.
    train_arrays = train_arrays.select(
        "series_id", java_norm_expr(F.col("values")).alias("values")
    )
    max_len = train_arrays.agg(F.max(F.size("values"))).collect()[0][0]
    # the snapshot grid is capped at MAX_WINDOW_LENGTH = 250: fitTeaser
    # computes step from getMax(samples, MAX_WINDOW_LENGTH) =
    # min(250, longest series) (TEASERClassifier.java:36,141-143,
    # Classifier.java:634-640). For series longer than 250 the offsets
    # top out at 250, the last snapshot is forced by s >= S with
    # earliness 250/len < 1, and `offset >= length` never triggers —
    # this is why Coffee (len 286) decides visibly earlier than a
    # full-length grid would.
    step = min(max_len, max_offset) / s_total
    min_w = 3  # max(3, MIN_WINDOW_LENGTH)

    todo = []
    for s in range(2, s_total + 1):
        off = int(np.floor(step * s + 0.5))  # Java Math.round
        if off >= min_w:
            todo.append((s, off))

    def _fit_snapshot(arg):
        s, off = arg
        pref = _prefix(train_arrays, off)
        slave = grid.weasel_grid_fit(pref, lab, **kw)
        proba = slave.predict_proba(pref).join(lab, "series_id")
        # sort by series_id: the reference feeds libsvm in SAMPLE ORDER
        # and both the SMO working-set walk and the java-Random(1)
        # contiguous CV folds in fit_master depend on row order —
        # toPandas() partition order is not deterministic
        pdf = (
            proba.select("series_id", "pred_label", "label", "probs")
            .toPandas()
            .sort_values("series_id", kind="mergesort")
            .reset_index(drop=True)
        )
        correct = pdf[pdf["pred_label"] == pdf["label"]]
        if len(correct) == 0:
            return s, off, slave, None
        feats = oneclass.master_features(np.vstack(correct["probs"].to_numpy()))
        return s, off, slave, oneclass.fit_master(feats, nu=nu)

    # snapshot fits run SERIALLY: each weasel_grid_fit already keeps the
    # cluster busy (10 concurrent fold-LR jobs inside), and stacking
    # snapshots multiplies the per-task LR aggregation buffers
    # (numClasses × vocab doubles) past the execution-memory pool.
    snapshots, offsets, slaves, masters = [], {}, {}, {}
    for s, off, slave, master in map(_fit_snapshot, todo):
        if master is None:
            continue
        masters[s] = master
        slaves[s] = slave
        offsets[s] = off
        snapshots.append(s)
    snapshots.sort()

    model = TeaserWeaselModel(
        snapshots=snapshots,
        offsets=offsets,
        slaves=slaves,
        masters=masters,
        threshold=v_grid[0],
        s_max=s_total,
        n_classes=lab.select("label").distinct().count(),
    )
    # threshold grid on TRAIN, full-length series (testing=false)
    snap = _snapshot_frame(model, train_arrays, testing=False).cache()
    n_train = lab.count()
    best_v, best_hm = v_grid[0], -1.0
    for v in v_grid:
        dec = _decide(snap, v, s_total).join(lab, "series_id")
        r = dec.agg(
            F.sum((F.col("pred_label") == F.col("label")).cast("long")),
            F.sum("earliness"),
        ).collect()[0]
        acc = (r[0] or 0) / n_train
        earliness = 1.0 - (r[1] or 0.0) / n_train
        hm = (
            2 * acc * earliness / (acc + earliness) if (acc + earliness) > 0 else 0.0
        )
        if hm > best_hm:
            best_hm, best_v = hm, v
    snap.unpersist()
    model.threshold = best_v
    return model


def teaser_weasel_predict(
    model: TeaserWeaselModel, test_arrays: DataFrame
) -> DataFrame:
    """(series_id, pred_label, earliness) on truncated test prefixes."""
    snap = _snapshot_frame(model, test_arrays, testing=True)
    return _decide(snap, model.threshold, model.s_max)
