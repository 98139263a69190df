"""Classifier driver queries.

r4: the BOSS-family predicts (boss_ensemble, bossvs, boss_grid,
shotgun_ensemble) carry full end-to-end SQL oracles (oracles_ml.py) —
words, bags, exact-bigint 1-NN, tf-idf, factor filter, norm pick and
the fit() Score mutation are all mirrored in DuckDB. r6: the
WEASEL/MUSE predicts (iterative L-BFGS softmax solves, no SQL
equivalent for the solve itself) moved from rows-only to
surrogate oracles — their outputs are the _predict_invariants
surface, fully DuckDB-checkable; prediction values stay certified by
the golden tests in tests/test_classifiers.py / test_goldens.py.

Each query trains on the events-derived series (label = series_id % 3,
train = series_id % 5 != 0) and predicts the held-out series. BOSS
ensemble predictions are integer-deterministic (bag distances are
exact bigints); WEASEL solves its linear model with the driver-local
softmax + L-BFGS solver (ml/linear.py) over the distributed bag
featurization, mirroring the reference's single-node liblinear split.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sfa_spark.ml import classifiers as C
from sfa_spark.operators import knn
from sfa_spark.queries import N_LABELS, TEST_MOD, series_df
from sfa_spark.sources.events import load_table, series_arrays_from_events


def _corpus(spark, sf_dir):
    # direct events→arrays gather (r8): skips the long-form Sort +
    # row_number/count windows — see series_arrays_from_events
    arrays = series_arrays_from_events(
        load_table(spark, sf_dir, "events")
    ).where(
        F.size("values") >= 32
    ).cache()
    labels = arrays.select(
        "series_id", (F.col("series_id") % N_LABELS).cast("double").alias("label")
    )
    train_a = arrays.where(F.col("series_id") % TEST_MOD != 0)
    test_a = arrays.where(F.col("series_id") % TEST_MOD == 0)
    return train_a, labels, test_a


def q_boss_ensemble_predict(spark, sf_dir):
    train_a, labels, test_a = _corpus(spark, sf_dir)
    train_l = labels.join(train_a.select("series_id"), "series_id")
    model = C.boss_ensemble_fit(
        train_a, train_l, windows=[16], word_lengths=(4, 6), alphabet=4
    )
    return model.predict(test_a).select(
        "series_id", F.col("pred_label").cast("double").alias("pred_label")
    )


def _predict_invariants(pred: "DataFrame", label_map: list[float]):
    """Decision-rule invariants over an exported-scores predict frame
    (series_id, pred_label, scores) — the surrogate-oracle surface for
    iterative-solver classifiers (VERDICT r5 task 3). Every column is
    either DuckDB-computable (series_id, n_classes from the train
    label domain) or a decision-rule invariant that must be constant
    TRUE (pred ∈ label domain; pred == argmax of the exported logits,
    recomputed from the scores array rather than trusted; all logits
    finite). A hash-match therefore proves test-set identity, the
    label domain, and the argmax decision rule — prediction VALUES
    remain certified by the golden suite (reference fixture accuracy
    within ±0.05), which no SQL engine can replay."""
    k = len(label_map)
    labels_arr = F.array(*[F.lit(float(l)) for l in label_map])
    idx = (F.array_position("scores", F.array_max("scores"))).cast("int")
    argmax_ok = F.when(
        idx > 0, F.element_at(labels_arr, idx) == F.col("pred_label")
    ).otherwise(F.lit(False))
    finite = (
        F.size(
            F.filter(
                F.col("scores"),
                lambda s: s.isNotNull()
                & ~F.isnan(s)
                & (F.abs(s) < F.lit(float("inf"))),
            )
        )
        == F.lit(k)
    )
    return pred.select(
        "series_id",
        F.lit(k).cast("int").alias("n_classes"),
        F.array_contains(labels_arr, F.col("pred_label")).alias(
            "pred_in_domain"
        ),
        argmax_ok.alias("argmax_ok"),
        finite.alias("scores_finite"),
    )


def q_weasel_predict(spark, sf_dir):
    """WEASEL fit + predict with the decision artifacts EXPORTED and
    oracle-checked (upgraded r6 from rows-only): the output is the
    _predict_invariants surface — test-set identity + n_classes are
    recomputed by DuckDB from the same series derivation the other ML
    oracles use; pred-in-domain / argmax-consistency / logit
    finiteness must all hash as constant TRUE. The iterative softmax
    solve itself stays golden-certified (WEASELClassifier.java:124-163
    predict; tests/test_goldens.py)."""
    train_a, labels, test_a = _corpus(spark, sf_dir)
    train_l = labels.join(train_a.select("series_id"), "series_id")
    # single window keeps the driver's correctness pass fast; the
    # multi-window union path is exercised by tests/test_classifiers.py
    model = C.weasel_fit(
        train_a, train_l, windows=[16], word_length=4, alphabet=4, max_iter=15
    )
    pred = C.weasel_predict(model, test_a, with_scores=True)
    return _predict_invariants(pred, model.label_map)


def q_bossvs_predict(spark, sf_dir):
    train_a, labels, test_a = _corpus(spark, sf_dir)
    train_l = labels.join(train_a.select("series_id"), "series_id")
    model = C.bossvs_fit(
        train_a, train_l, windows=[16], word_lengths=(4,), n_folds=2
    )
    return model.predict(test_a).select(
        "series_id", F.col("pred_label").cast("double").alias("pred_label")
    )


def q_muse_predict(spark, sf_dir, *, budget: str = "gate"):
    """MUSE (C7) with the reference-DEFAULT grid machinery (histType ×
    norm × f — grid.muse_grid_fit, MUSEClassifier.java:163-268) on a
    2-dim corpus built from the events series via the derivative
    channel (S4): dim 0 = value, dim 1 = |first diff|.

    ONE parameterized registration (r5 merged the former
    q_muse_predict_full into this query): the driver gate runs the
    default ``budget="gate"`` envelope (window grid subsampled to 3,
    2-fold CV, 12 solver iterations — same code path, per-query driver
    budget); ``budget="full"`` runs the UNTRIMMED reference-default
    grid (every window 2..min(450, len), histType {equi-depth,
    equi-width} × norm × f {2,4,6}, 10-fold CV, early exit) — too slow
    for the gate (~270 s at sf0.01) and certified instead by the
    PenDigits golden (test_muse_grid_default_pendigits, ≥0.90), which
    exercises the identical untrimmed code path on reference data.
    Output is the _predict_invariants surrogate-oracle surface
    (upgraded r6 from rows-only): test-set identity + n_classes
    DuckDB-recomputed, decision-rule invariants hash-checked as
    constant TRUE; the iterative solve stays golden-certified."""
    from sfa_spark.ml import grid
    from sfa_spark.sources.multivariate import derivatives, dim_arrays

    assert budget in ("gate", "full")
    s = series_df(spark, sf_dir).withColumn("dim", F.lit(0).cast("int"))
    mv = derivatives(s.select("series_id", "dim", "pos", "value", "n"), n_dims=1)
    arrays = dim_arrays(mv).where(F.size("values") >= 32).cache()
    labels = (
        arrays.select("series_id").distinct()
        .withColumn("label", (F.col("series_id") % N_LABELS).cast("double"))
    )
    train_l = labels.where(F.col("series_id") % TEST_MOD != 0)
    train_a = arrays.join(train_l.select("series_id"), "series_id")
    test_a = arrays.join(
        labels.where(F.col("series_id") % TEST_MOD == 0).select("series_id"),
        "series_id",
    )
    kw = (
        {}
        if budget == "full"
        else dict(f_values=(4,), min_window=12, max_windows=3, n_folds=2, max_iter=12)
    )
    model = grid.muse_grid_fit(train_a, train_l, **kw)
    pred = model.predict(test_a, with_scores=True)
    return _predict_invariants(pred, model.label_map)


def q_shotgun_1nn(spark, sf_dir):
    train_a, labels, test_a = _corpus(spark, sf_dir)
    nn = knn.shotgun_1nn(test_a, train_a, window=16)
    return nn.select(
        "series_id", "nn_id",
        (F.round(F.col("dist") + F.lit(1e-9), 4) + F.lit(0.0)).alias("dist"),
    )


def q_boss_grid_predict(spark, sf_dir):
    """Grid-as-data BOSS ensemble (ml/grid.py): the reference's
    norm × window × f axes as COLUMNS — one distributed plan fits every
    combination (small grid here; the full default grid runs in
    tests/test_goldens.py against the reference's published
    accuracies)."""
    from sfa_spark.ml import grid

    train_a, labels, test_a = _corpus(spark, sf_dir)
    train_l = labels.join(train_a.select("series_id"), "series_id")
    model = grid.boss_ensemble_grid_fit(
        train_a, train_l, windows=[12, 16], word_lengths=(4, 6)
    )
    return model.predict(test_a).select(
        "series_id", F.col("pred_label").cast("double").alias("pred_label")
    )


def q_shotgun_ensemble_predict(spark, sf_dir):
    """Shotgun Ensemble (C8b): per-(norm, window) shotgun 1-NN in one
    grouped pass, factor-filtered members, weighted vote."""
    from sfa_spark.ml import grid

    train_a, labels, test_a = _corpus(spark, sf_dir)
    train_l = labels.join(train_a.select("series_id"), "series_id")
    model = grid.shotgun_grid_fit(
        train_a, train_l, windows=[8, 12, 16], factor=0.92, ensemble=True
    )
    return model.predict(test_a).select(
        "series_id", F.col("pred_label").cast("double").alias("pred_label")
    )
