"""TEASER early time-series classification (SURVEY §2.7 C9-C10).

Reference parity:
  * fit — TEASERClassifier.fit (`/root/reference/src/main/java/sfa/classification/TEASERClassifier.java:138-195`):
    S prefix snapshots (equal steps); a slave classifier per snapshot;
    a master filter deciding whether to trust the slave; then a grid
    over v ∈ 2..5 (consecutive identical accepted predictions) choosing
    the v that maximizes harmonic mean(accuracy, earliness) on train.
  * predict — (`TEASERClassifier.java:273-363`): walk snapshots
    ascending, count consecutive identical accepted predictions, emit
    at streak ≥ v; forced decision at the last snapshot.

Deviations (documented):
  * slave: tf-idf (BOSS VS) scorer by default — WEASEL slaves plug in
    via the same interface but cost S full fits.
  * master: the reference's RBF one-class SVM (M6) needs sklearn
    (absent here); we use the quantile-threshold master: accept a
    snapshot prediction iff its normalized top-score ≥ the q-quantile
    of top-scores among CORRECTLY-classified train samples at that
    snapshot — same shape (per-snapshot acceptance on the score
    feature), swappable for the SVM when available.

The predict path is pure DataFrame ops: per-snapshot scores → accept
flag → gaps-and-islands streak → first qualifying snapshot (or forced
final). The batch streak rule is the same one the streaming
teaser_accept (streaming/scoring.py) applies incrementally.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sfa_spark.operators import bags, sfa, tfidf
from sfa_spark.operators.words import mask_word


@dataclass
class TeaserSlave:
    snapshot: int  # 1..S
    prefix_len: int
    model: sfa.SFAModel
    word_length: int
    tfidf: DataFrame
    tau: float  # master acceptance threshold on normalized top score


@dataclass
class TeaserModel:
    slaves: list[TeaserSlave]
    v: int  # consecutive-prediction threshold
    series_len: int
    n_snapshots: int


def _prefix(arrays: DataFrame, prefix_len: int) -> DataFrame:
    """Truncated prefix, re-z-normalized to its own stats — reference
    extractUntilOffset goes through TimeSeries.getSubsequence which
    norm()s the fresh slice (TimeSeries.java:177-182)."""
    from sfa_spark.ml.teaser_weasel import java_norm_expr

    return arrays.select(
        "series_id",
        java_norm_expr(F.slice("values", 1, prefix_len)).alias("values"),
    )


def _slave_scores(slave: TeaserSlave, arrays: DataFrame) -> DataFrame:
    """(series_id, pred_label, top, margin): argmax class + normalized
    top score (score / Σ scores) as the acceptance feature."""
    words = sfa.transform_windowing(slave.model, arrays)
    masked = words.withColumn(
        "word", mask_word(F.col("word"), slave.word_length, slave.model.alphabet)
    )
    bag = bags.bag_of_words(bags.numerosity_reduce(masked))
    scored = (
        bag.join(F.broadcast(slave.tfidf), "word")
        .groupBy("series_id", "label")
        .agg(F.sum(F.col("cnt") * F.col("weight")).alias("score"))
    )
    w = Window.partitionBy("series_id")
    rk = Window.partitionBy("series_id").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("total", F.sum("score").over(w))
        .withColumn("rn", F.row_number().over(rk))
        .where(F.col("rn") == 1)
        .select(
            "series_id",
            F.col("label").alias("pred_label"),
            F.when(F.col("total") > 0, F.col("score") / F.col("total"))
            .otherwise(F.lit(0.0))
            .alias("top"),
        )
    )


def teaser_fit(
    train_arrays: DataFrame,
    labels: DataFrame,
    n_snapshots: int = 5,
    window: int = 16,
    word_length: int = 4,
    alphabet: int = 4,
    accept_quantile: float = 0.1,
    v_grid: tuple[int, ...] = (1, 2, 3),
) -> TeaserModel:
    series_len = train_arrays.select(F.min(F.size("values"))).collect()[0][0]
    # snapshot grid capped at 250 like the reference's
    # getMax(samples, MAX_WINDOW_LENGTH) step base (Classifier.java:634)
    step_base = min(series_len, 250)
    slaves: list[TeaserSlave] = []
    all_scores = []
    for s in range(1, n_snapshots + 1):
        plen = max(window, step_base * s // n_snapshots)
        pref = _prefix(train_arrays, plen).cache()
        model = sfa.fit(
            pref, window=window, word_length=word_length, alphabet=alphabet,
            histogram="equi_depth",
        )
        words = sfa.transform_windowing(model, pref)
        bag = bags.bag_of_words(bags.numerosity_reduce(words))
        m = tfidf.fit_tfidf(bag.join(labels, "series_id")).cache()
        slave = TeaserSlave(s, plen, model, word_length, m, tau=0.0)
        sc = _slave_scores(slave, pref).join(labels, "series_id").cache()
        correct_tops = sc.where(F.col("pred_label") == F.col("label")).select("top")
        try:
            tau = correct_tops.agg(
                F.percentile("top", F.lit(accept_quantile))
            ).collect()[0][0]
        except Exception:  # noqa: BLE001
            tau = None
        slave.tau = float(tau) if tau is not None else 0.0
        slaves.append(slave)
        all_scores.append(
            sc.select(
                "series_id", F.lit(s).alias("s"), "pred_label", "top", "label"
            ).withColumn("accepted", F.col("top") >= F.lit(slave.tau))
        )
    snap = all_scores[0]
    for x in all_scores[1:]:
        snap = snap.unionByName(x)
    snap = snap.cache()

    # v grid: harmonic mean of accuracy and earliness on train
    best_v, best_hm = v_grid[0], -1.0
    for v in v_grid:
        dec = _decide(snap.drop("label"), slaves, v, n_snapshots)
        evald = dec.join(labels, "series_id").agg(
            F.avg((F.col("pred_label") == F.col("label")).cast("double")).alias("acc"),
            F.avg(F.lit(1.0) - F.col("earliness")).alias("late"),
        ).collect()[0]
        # evald["late"] is already avg(1 - earliness) — the earliness
        # BENEFIT (higher = decided earlier); use it directly, matching
        # mteaser_fit and the reference's HM(acc, 1 - earliness)
        acc = evald["acc"] or 0.0
        earl = evald["late"] if evald["late"] is not None else 0.0
        hm = 2 * acc * earl / (acc + earl) if (acc + earl) > 0 else 0.0
        if hm > best_hm:
            best_hm, best_v = hm, v
    return TeaserModel(slaves, best_v, series_len, n_snapshots)


def _decide(
    snap: DataFrame, slaves: list[TeaserSlave], v: int, n_snapshots: int
) -> DataFrame:
    """snapshot predictions (series_id, s, pred_label, accepted) →
    one decision per series: first snapshot whose accepted streak of
    identical predictions reaches v; else forced at the last snapshot.
    Gaps-and-islands with window functions — no driver loop."""
    w = Window.partitionBy("series_id").orderBy("s")
    plen_map = {sl.snapshot: sl.prefix_len for sl in slaves}
    total = max(sl.prefix_len for sl in slaves)
    chg = (
        F.when(~F.col("accepted"), F.lit(1))
        .when(F.col("pred_label") != F.lag("pred_label").over(w), F.lit(1))
        .when(F.lag("accepted").over(w).isNull() | ~F.lag("accepted").over(w), F.lit(1))
        .otherwise(F.lit(0))
    )
    runs = snap.withColumn("chg", chg).withColumn(
        "run", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    streaks = runs.withColumn(
        "streak",
        F.when(
            F.col("accepted"),
            F.row_number().over(Window.partitionBy("series_id", "run").orderBy("s")),
        ).otherwise(F.lit(0)),
    )
    hit = streaks.where(F.col("streak") >= v)
    first_hit = (
        hit.withColumn(
            "rn", F.row_number().over(Window.partitionBy("series_id").orderBy("s"))
        )
        .where(F.col("rn") == 1)
        .select("series_id", "s", "pred_label")
    )
    forced = (
        snap.where(F.col("s") == n_snapshots)
        .select("series_id", F.col("pred_label").alias("forced_label"))
    )
    plen_df = snap.sparkSession.createDataFrame(
        [(s, plen_map[s]) for s in plen_map], "s int, plen int"
    )
    return (
        forced.join(first_hit, "series_id", "left")
        .withColumn("s", F.coalesce("s", F.lit(n_snapshots)))
        .withColumn("pred_label", F.coalesce("pred_label", "forced_label"))
        .join(F.broadcast(plen_df), "s")
        .select(
            "series_id",
            "pred_label",
            (F.col("plen") / F.lit(float(total))).alias("earliness"),
        )
    )


def teaser_predict(model: TeaserModel, test_arrays: DataFrame) -> DataFrame:
    """(series_id, pred_label, earliness) — earliness = fraction of the
    series consumed before the decision (lower is earlier)."""
    parts = []
    for sl in model.slaves:
        pref = _prefix(test_arrays, sl.prefix_len)
        sc = _slave_scores(sl, pref)
        parts.append(
            sc.select(
                "series_id", F.lit(sl.snapshot).alias("s"), "pred_label", "top"
            ).withColumn("accepted", F.col("top") >= F.lit(sl.tau))
        )
    snap = parts[0]
    for p in parts[1:]:
        snap = snap.unionByName(p)
    return _decide(snap, model.slaves, model.v, model.n_snapshots)


# ---------------------------------------------------------------- MTEASER (C11)

@dataclass
class MTeaserSlave:
    snapshot: int
    prefix_len: int
    parts: list  # [(dim, SFAModel, word_length, tfidf DataFrame)]
    tau: float


@dataclass
class MTeaserModel:
    slaves: list[MTeaserSlave]
    v: int
    n_snapshots: int


def _mv_prefix(mv_arrays: DataFrame, plen: int) -> DataFrame:
    """Per-dimension truncated prefix, re-z-normalized per dim —
    MultiVariateTimeSeries.getSubsequence norm()s every dimension's
    fresh slice (MultiVariateTimeSeries.java:32-39)."""
    from sfa_spark.ml.teaser_weasel import java_norm_expr

    return mv_arrays.select(
        "series_id",
        "dim",
        java_norm_expr(F.slice("values", 1, plen)).alias("values"),
    )


def _mslave_scores(slave: MTeaserSlave, mv_arrays: DataFrame) -> DataFrame:
    """Multivariate slave: per-dim tf-idf scores summed over dims
    (reference MTEASER uses a MUSE slave — same shape: per-dim features
    pooled into one class score)."""
    parts = []
    for dim, model, wl, m in slave.parts:
        arr = mv_arrays.where(F.col("dim") == dim).select("series_id", "values")
        words = sfa.transform_windowing(model, arr)
        masked = words.withColumn("word", mask_word(F.col("word"), wl, model.alphabet))
        bag = bags.bag_of_words(bags.numerosity_reduce(masked))
        parts.append(
            bag.join(F.broadcast(m), "word")
            .groupBy("series_id", "label")
            .agg(F.sum(F.col("cnt") * F.col("weight")).alias("score"))
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    scored = allp.groupBy("series_id", "label").agg(F.sum("score").alias("score"))
    w = Window.partitionBy("series_id")
    rk = Window.partitionBy("series_id").orderBy(F.col("score").desc(), F.col("label").asc())
    return (
        scored.withColumn("total", F.sum("score").over(w))
        .withColumn("rn", F.row_number().over(rk))
        .where(F.col("rn") == 1)
        .select(
            "series_id",
            F.col("label").alias("pred_label"),
            F.when(F.col("total") > 0, F.col("score") / F.col("total"))
            .otherwise(F.lit(0.0))
            .alias("top"),
        )
    )


def mteaser_fit(
    mv_arrays: DataFrame,
    labels: DataFrame,
    n_snapshots: int = 4,
    window: int = 16,
    word_length: int = 4,
    alphabet: int = 4,
    accept_quantile: float = 0.1,
    v_grid: tuple[int, ...] = (1, 2, 3),
) -> MTeaserModel:
    """MTEASER (reference MTEASERClassifier.java): TEASER control flow
    with a multivariate slave per snapshot."""
    dims = [r["dim"] for r in mv_arrays.select("dim").distinct().orderBy("dim").collect()]
    series_len = mv_arrays.select(F.min(F.size("values"))).collect()[0][0]
    step_base = min(series_len, 250)  # MTEASERClassifier.java:37,164-166
    slaves: list[MTeaserSlave] = []
    snaps = []
    for s in range(1, n_snapshots + 1):
        plen = max(window, step_base * s // n_snapshots)
        pref = _mv_prefix(mv_arrays, plen).cache()
        parts = []
        for d in dims:
            arr = pref.where(F.col("dim") == d).select("series_id", "values")
            model = sfa.fit(
                arr, window=window, word_length=word_length, alphabet=alphabet,
                histogram="equi_depth",
            )
            words = sfa.transform_windowing(model, arr)
            bag = bags.bag_of_words(bags.numerosity_reduce(words))
            m = tfidf.fit_tfidf(bag.join(labels, "series_id")).cache()
            parts.append((d, model, word_length, m))
        slave = MTeaserSlave(s, plen, parts, tau=0.0)
        sc = _mslave_scores(slave, pref).join(labels, "series_id").cache()
        correct = sc.where(F.col("pred_label") == F.col("label")).select("top")
        try:
            tau = correct.agg(F.percentile("top", F.lit(accept_quantile))).collect()[0][0]
        except Exception:  # noqa: BLE001
            tau = None
        slave.tau = float(tau) if tau is not None else 0.0
        slaves.append(slave)
        snaps.append(
            sc.select("series_id", F.lit(s).alias("s"), "pred_label", "top")
            .withColumn("accepted", F.col("top") >= F.lit(slave.tau))
        )
    snap = snaps[0]
    for x in snaps[1:]:
        snap = snap.unionByName(x)
    snap = snap.cache()
    best_v, best_hm = v_grid[0], -1.0
    fake = [TeaserSlave(sl.snapshot, sl.prefix_len, None, 0, None, sl.tau) for sl in slaves]
    for v in v_grid:
        dec = _decide(snap, fake, v, n_snapshots)
        ev = dec.join(labels, "series_id").agg(
            F.avg((F.col("pred_label") == F.col("label")).cast("double")).alias("acc"),
            F.avg("earliness").alias("e"),
        ).collect()[0]
        acc, earl = ev["acc"] or 0.0, 1.0 - (ev["e"] or 1.0)
        hm = 2 * acc * earl / (acc + earl) if (acc + earl) > 0 else 0.0
        if hm > best_hm:
            best_hm, best_v = hm, v
    return MTeaserModel(slaves, best_v, n_snapshots)


def mteaser_predict(model: MTeaserModel, mv_arrays: DataFrame) -> DataFrame:
    parts = []
    for sl in model.slaves:
        pref = _mv_prefix(mv_arrays, sl.prefix_len)
        sc = _mslave_scores(sl, pref)
        parts.append(
            sc.select("series_id", F.lit(sl.snapshot).alias("s"), "pred_label", "top")
            .withColumn("accepted", F.col("top") >= F.lit(sl.tau))
        )
    snap = parts[0]
    for p in parts[1:]:
        snap = snap.unionByName(p)
    fake = [TeaserSlave(sl.snapshot, sl.prefix_len, None, 0, None, sl.tau) for sl in model.slaves]
    return _decide(snap, fake, model.v, model.n_snapshots)
