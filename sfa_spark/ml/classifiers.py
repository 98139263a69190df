"""Classifiers (SURVEY §2.7): BOSS Ensemble, BOSS VS, WEASEL.

Reference parity:
  * BOSS Ensemble — BOSSEnsembleClassifier.fit/predict
    (`/root/reference/src/main/java/sfa/classification/BOSSEnsembleClassifier.java:83-278`):
    grid over windows; per window compute words ONCE at max f and
    re-mask per f (word & mask, BOSS.java:125); score by leave-one-out
    1-NN train accuracy; keep members within factor=0.92 of best;
    predict by weighted majority vote (weight = train score).
  * BOSS VS — BOSSVSClassifier (`BOSSVSClassifier.java:88-263`):
    same grid shape, tf-idf model + cosine-ish scoring, factor 0.95.
  * WEASEL — WEASELClassifier (`WEASELClassifier.java:214-309`):
    per window length: supervised SFA (ANOVA+IG) words → unigram+bigram
    keys → union over windows → χ² selection → dictionary → sparse
    features → logistic regression (liblinear → MLlib LogisticRegression).

Spark shape: the parameter grid is a driver-side loop (small, as in the
reference) but EVERY per-parameter step is a set-oriented Spark job
over all series at once; per-window words are cached and re-masked per
f exactly like the reference. Distances/scores are integer/rational →
deterministic model selection.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sfa_spark.operators import bags, folds, knn, sfa, select, tfidf
from sfa_spark.operators.words import mask_word


def _loo_accuracy(bag: DataFrame, labels: DataFrame) -> float:
    """Leave-one-out 1-NN train accuracy over a bag table.

    Queries with no accepted neighbor (reference predicts null) count
    as incorrect — divide by the full sample count, not matched rows.
    """
    nn = knn.boss_1nn(bag, bag, loo=True)
    correct = (
        nn.join(labels, "series_id")
        .join(
            labels.select(
                F.col("series_id").alias("nn_id"), F.col("label").alias("nn_label")
            ),
            "nn_id",
        )
        .agg(F.sum((F.col("label") == F.col("nn_label")).cast("long")))
        .collect()[0][0]
        or 0
    )
    total = labels.count()
    return correct / total if total else 0.0


@dataclass
class BossMember:
    window: int
    word_length: int
    score: float
    model: sfa.SFAModel
    train_bags: DataFrame
    train_labels: DataFrame


@dataclass
class BossEnsembleModel:
    members: list[BossMember]

    def predict(self, test_arrays: DataFrame) -> DataFrame:
        votes = []
        for m in self.members:
            words = sfa.transform_windowing(m.model, test_arrays)
            masked = words.withColumn(
                "word", mask_word(F.col("word"), m.word_length, m.model.alphabet)
            )
            bag = bags.bag_of_words(bags.numerosity_reduce(masked))
            nn = knn.boss_1nn(bag, m.train_bags)
            v = nn.join(
                m.train_labels.select(
                    F.col("series_id").alias("nn_id"), F.col("label").alias("pred_label")
                ),
                "nn_id",
            ).select("series_id", "pred_label", F.lit(m.score).alias("weight"))
            votes.append(v)
        allv = votes[0]
        for v in votes[1:]:
            allv = allv.unionByName(v)
        return folds.weighted_vote(allv)


def boss_ensemble_fit(
    train_arrays: DataFrame,
    labels: DataFrame,
    windows: list[int],
    word_lengths: tuple[int, ...] = (6, 8, 10, 12, 14, 16),
    alphabet: int = 4,
    factor: float = 0.92,
    norm_mean: bool = False,
) -> BossEnsembleModel:
    """Grid fit. Words per window computed once at max f, re-masked per
    f (exactly the reference's caching trick); best f kept per window;
    members below best·factor dropped."""
    max_f = max(word_lengths)
    candidates: list[BossMember] = []
    for w in windows:
        model = sfa.fit(
            train_arrays, window=w, word_length=max_f, alphabet=alphabet,
            histogram="equi_depth", norm_mean=norm_mean,
        )
        words = sfa.transform_windowing(model, train_arrays).cache()
        best: BossMember | None = None
        for f in word_lengths:
            masked = words.withColumn("word", mask_word(F.col("word"), f, alphabet))
            bag = bags.bag_of_words(bags.numerosity_reduce(masked)).cache()
            acc = _loo_accuracy(bag, labels)
            if best is None or acc > best.score:
                best = BossMember(w, f, acc, model, bag, labels)
        if best is not None:
            best.train_bags = best.train_bags.cache()
            candidates.append(best)
        words.unpersist()
    top = max(c.score for c in candidates)
    members = [c for c in candidates if c.score >= top * factor]
    return BossEnsembleModel(members)


@dataclass
class BossVSMember:
    window: int
    word_length: int
    score: float
    model: sfa.SFAModel
    tfidf: DataFrame


@dataclass
class BossVSModel:
    members: list[BossVSMember]
    alphabet: int = 4

    def predict(self, test_arrays: DataFrame) -> DataFrame:
        votes = []
        for m in self.members:
            words = sfa.transform_windowing(m.model, test_arrays)
            masked = words.withColumn(
                "word", mask_word(F.col("word"), m.word_length, m.model.alphabet)
            )
            bag = bags.bag_of_words(bags.numerosity_reduce(masked))
            pred = tfidf.score_tfidf(bag, m.tfidf)
            votes.append(
                pred.select("series_id", "pred_label", F.lit(m.score).alias("weight"))
            )
        allv = votes[0]
        for v in votes[1:]:
            allv = allv.unionByName(v)
        return folds.weighted_vote(allv)


def sqrt_spaced_windows(min_w: int, max_w: int, count: int) -> list[int]:
    """BOSS VS's √-spaced window sampling (BOSSVSClassifier.java:98-103):
    denser at small windows, sparser at large — √-scale interpolation."""
    import math

    if count <= 1 or max_w <= min_w:
        return [min_w]
    lo, hi = math.sqrt(min_w), math.sqrt(max_w)
    ws = {int(round((lo + (hi - lo) * i / (count - 1)) ** 2)) for i in range(count)}
    return sorted(max(min_w, min(max_w, w)) for w in ws)


def bossvs_fit(
    train_arrays: DataFrame,
    labels: DataFrame,
    windows: list[int],
    word_lengths: tuple[int, ...] = (4, 6, 8),
    alphabet: int = 4,
    factor: float = 0.95,
    n_folds: int = 3,
    norm_mean: bool = False,
) -> BossVSModel:
    """Grid fit scored by stratified k-fold CV accuracy of the tf-idf
    scorer (reference uses 10 folds; configurable here)."""
    max_f = max(word_lengths)
    folded = folds.stratified_folds(labels, n_folds).cache()
    candidates: list[BossVSMember] = []
    for w in windows:
        model = sfa.fit(
            train_arrays, window=w, word_length=max_f, alphabet=alphabet,
            histogram="equi_depth", norm_mean=norm_mean,
        )
        words = sfa.transform_windowing(model, train_arrays).cache()
        best: BossVSMember | None = None
        for f in word_lengths:
            masked = words.withColumn("word", mask_word(F.col("word"), f, alphabet))
            bag = bags.bag_of_words(bags.numerosity_reduce(masked)).cache()
            labeled = bag.join(folded, "series_id")
            correct, total = 0.0, 0.0
            for i in range(n_folds):
                tr = labeled.where(F.col("fold") != i)
                te = labeled.where(F.col("fold") == i).select("series_id", "word", "cnt")
                mdl = tfidf.fit_tfidf(tr.select("series_id", "word", "cnt", "label"))
                pred = tfidf.score_tfidf(te, mdl).join(labels, "series_id")
                r = pred.agg(
                    F.sum((F.col("pred_label") == F.col("label")).cast("double")),
                    F.count(F.lit(1)),
                ).collect()[0]
                correct += r[0] or 0.0
                total += r[1]
            acc = correct / total if total else 0.0
            if best is None or acc > best.score:
                full = tfidf.fit_tfidf(bag.join(labels, "series_id"))
                best = BossVSMember(w, f, acc, model, full.cache())
        if best is not None:
            candidates.append(best)
        words.unpersist()
    top = max(c.score for c in candidates)
    return BossVSModel([c for c in candidates if c.score >= top * factor], alphabet)


# ---------------------------------------------------------------- WEASEL

@dataclass
class WeaselModel:
    sfa_models: dict[int, sfa.SFAModel]  # window length → supervised SFA
    dictionary: DataFrame  # (key, idx)
    lr_model: object  # MLlib LogisticRegressionModel
    label_map: list[float]  # index → label
    n_features: int


def _weasel_features(
    sfa_models: dict[int, sfa.SFAModel], arrays: DataFrame
) -> DataFrame:
    """Union of unigram+bigram key bags across all window lengths."""
    parts = []
    for w, model in sfa_models.items():
        words = sfa.transform_windowing(model, arrays)
        parts.append(bags.weasel_keys(words, window_length=w, bigrams=True))
    allk = parts[0]
    for p in parts[1:]:
        allk = allk.unionByName(p)
    return bags.bag_of_keys(allk)


def _to_vectors(key_bags: DataFrame, dictionary: DataFrame, n_features: int) -> DataFrame:
    """bags ⋈ dictionary → MLlib SparseVector features per series."""
    from pyspark.ml.linalg import SparseVector, VectorUDT

    joined = (
        key_bags.join(F.broadcast(dictionary), "key")
        .groupBy("series_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("idx").alias("i"), F.col("cnt").alias("v")))
            ).alias("pairs")
        )
    )

    @F.udf(returnType=VectorUDT())
    def to_vec(pairs):
        return SparseVector(
            n_features, [p["i"] for p in pairs], [float(p["v"]) for p in pairs]
        )

    return joined.select("series_id", to_vec("pairs").alias("features"))


def _empty_vec_fill(all_ids: DataFrame, feats: DataFrame, n_features: int) -> DataFrame:
    """Left-join features onto the full id set, filling series with zero
    surviving keys with an empty SparseVector (they still need a row)."""
    from pyspark.ml.linalg import SparseVector, VectorUDT

    n_feats = n_features  # close over the int only (picklable)

    @F.udf(returnType=VectorUDT())
    def empty_vec():
        return SparseVector(n_feats, [], [])

    return all_ids.join(feats, "series_id", "left").select(
        "series_id", F.coalesce("features", empty_vec()).alias("features")
    )


def weasel_fit(
    train_arrays: DataFrame,
    labels: DataFrame,
    windows: list[int],
    word_length: int = 4,
    alphabet: int = 4,
    chi2_limit: float = 2.0,
    word_limit: int = 10000,
    max_iter: int = 25,
    reg_param: float = 1.0,
) -> WeaselModel:
    """Fit WEASEL: supervised SFA per window → key bags → χ² →
    dictionary → LogisticRegression (the liblinear L2R_LR analogue)."""
    from pyspark.ml.classification import LogisticRegression

    sfa_models = {
        w: sfa.fit_supervised(
            train_arrays, labels, window=w, word_length=word_length,
            alphabet=alphabet, histogram="information_gain",
            max_coefs=max(8, word_length * 2),
        )
        for w in windows
    }
    key_bags = _weasel_features(sfa_models, train_arrays).cache()
    selected = select.chi_squared(
        key_bags.join(labels, "series_id"),
        limit=chi2_limit, word_limit=word_limit, key_col="key",
    )
    kept = select.filter_bags(key_bags, selected, key_col="key")
    dictionary = (
        kept.select("key").distinct()
        .withColumn(
            "idx",
            # vocabulary is χ²-capped (≤ ~2·word_limit rows); constant
            # partition avoids the no-partition global-sort WindowExec
            F.row_number().over(Window.partitionBy(F.lit(0)).orderBy("key")) - 1,
        )
        .cache()
    )
    n_features = dictionary.count() + 1
    feats = _to_vectors(kept, dictionary, n_features)
    label_map = [r["label"] for r in labels.select("label").distinct().orderBy("label").collect()]
    lmap = {lab: i for i, lab in enumerate(label_map)}
    lmap_df = labels.sparkSession.createDataFrame(
        [(float(lab), float(i)) for lab, i in lmap.items()],
        "label double, label_idx double",
    )
    # cache: LR iterates treeAggregate jobs — without this the whole
    # featurization lineage (MFT -> keys -> chi2 -> vectors) re-executes
    # EVERY iteration (observed 11s/iter at sf0.01)
    train = feats.join(labels, "series_id").join(F.broadcast(lmap_df), "label").cache()
    n_train = train.count()
    # liblinear parity: C=1 maps to regParam = 1/(C·n); MLlib's default
    # feature standardization has no liblinear counterpart
    lr = LogisticRegression(
        featuresCol="features", labelCol="label_idx",
        maxIter=max_iter, regParam=1.0 / (reg_param * n_train),
        family="multinomial", standardization=False,
    )
    lr_model = lr.fit(train)
    train.unpersist()
    return WeaselModel(sfa_models, dictionary, lr_model, label_map, n_features)


def weasel_predict(model: WeaselModel, test_arrays: DataFrame) -> DataFrame:
    key_bags = _weasel_features(model.sfa_models, test_arrays)
    feats = _to_vectors(key_bags, model.dictionary, model.n_features)
    # series with zero surviving keys still need a row (empty vector)
    all_ids = test_arrays.select("series_id")
    from pyspark.ml.linalg import SparseVector, VectorUDT

    n_feats = model.n_features  # close over the int only (picklable)

    @F.udf(returnType=VectorUDT())
    def empty_vec():
        return SparseVector(n_feats, [], [])

    feats = all_ids.join(feats, "series_id", "left").select(
        "series_id", F.coalesce("features", empty_vec()).alias("features")
    )
    pred = model.lr_model.transform(feats)
    idx_map = feats.sparkSession.createDataFrame(
        [(float(i), lab) for i, lab in enumerate(model.label_map)],
        "prediction double, pred_label double",
    )
    return pred.join(F.broadcast(idx_map), "prediction").select("series_id", "pred_label")


# ---------------------------------------------------------------- MUSE

@dataclass
class MuseModel:
    sfa_models: dict[tuple[int, int], sfa.SFAModel]  # (dim, window) → SFA
    dictionary: DataFrame
    lr_model: object
    label_map: list[float]
    n_features: int


def _muse_keys(words: DataFrame, dim: int, window: int, bigrams: bool) -> DataFrame:
    """MUSE struct key {w, dim, word, word2} (reference MuseWord,
    MUSE.java:152-183); unigrams have word2 = -1."""
    uni = words.select(
        "series_id",
        F.struct(
            F.lit(window).alias("w"),
            F.lit(dim).alias("d"),
            F.col("word").alias("word"),
            F.lit(-1).cast("bigint").alias("word2"),
        ).alias("key"),
    )
    if not bigrams:
        return uni
    wspec = Window.partitionBy("series_id").orderBy("win")
    bi = (
        words.withColumn("prev", F.lag("word", window).over(wspec))
        .where(F.col("prev").isNotNull())
        .select(
            "series_id",
            F.struct(
                F.lit(window).alias("w"),
                F.lit(dim).alias("d"),
                F.col("prev").alias("word"),
                F.col("word").alias("word2"),
            ).alias("key"),
        )
    )
    return uni.unionByName(bi)


def muse_fit(
    mv_arrays: DataFrame,
    labels: DataFrame,
    windows: list[int],
    word_length: int = 4,
    alphabet: int = 4,
    histogram: str = "equi_depth",
    chi2_limit: float = 2.0,
    bigrams: bool = True,
    max_iter: int = 25,
    reg_param: float = 1.0,
) -> MuseModel:
    """MUSE (multivariate WEASEL, reference MUSEClassifier.java:163-268):
    per (dimension × window) unsupervised SFA words → struct keys →
    χ² → dictionary → LogisticRegression.

    mv_arrays: (series_id, dim, values array<double>)."""
    from pyspark.ml.classification import LogisticRegression

    dims = [r["dim"] for r in mv_arrays.select("dim").distinct().orderBy("dim").collect()]
    sfa_models: dict[tuple[int, int], sfa.SFAModel] = {}
    parts = []
    for d in dims:
        arr_d = mv_arrays.where(F.col("dim") == d).select("series_id", "values")
        for w in windows:
            m = sfa.fit(
                arr_d, window=w, word_length=word_length, alphabet=alphabet,
                histogram=histogram,
            )
            sfa_models[(d, w)] = m
            words = sfa.transform_windowing(m, arr_d)
            parts.append(_muse_keys(words, d, w, bigrams))
    allk = parts[0]
    for p in parts[1:]:
        allk = allk.unionByName(p)
    key_bags = bags.bag_of_keys(allk).cache()
    selected = select.chi_squared(
        key_bags.join(labels, "series_id"), limit=chi2_limit,
        word_limit=10000, key_col="key",
    )
    kept = select.filter_bags(key_bags, selected, key_col="key")
    dictionary = (
        kept.select("key").distinct()
        .withColumn(
            "idx",
            # vocabulary is χ²-capped (≤ ~2·word_limit rows); constant
            # partition avoids the no-partition global-sort WindowExec
            F.row_number().over(Window.partitionBy(F.lit(0)).orderBy("key")) - 1,
        )
        .cache()
    )
    n_features = dictionary.count() + 1
    feats = _to_vectors(kept, dictionary, n_features)
    label_map = [r["label"] for r in labels.select("label").distinct().orderBy("label").collect()]
    lmap_df = labels.sparkSession.createDataFrame(
        [(float(lab), float(i)) for i, lab in enumerate(label_map)],
        "label double, label_idx double",
    )
    train = feats.join(labels, "series_id").join(F.broadcast(lmap_df), "label").cache()
    n_train = train.count()  # materialize before iterative LR (see weasel_fit note)
    lr = LogisticRegression(
        featuresCol="features", labelCol="label_idx",
        maxIter=max_iter, regParam=1.0 / (reg_param * n_train),
        family="multinomial", standardization=False,
    )
    model = lr.fit(train)
    train.unpersist()
    return MuseModel(sfa_models, dictionary, model, label_map, n_features)


def muse_predict(model: MuseModel, mv_arrays: DataFrame, bigrams: bool = True) -> DataFrame:
    parts = []
    for (d, w), m in model.sfa_models.items():
        arr_d = mv_arrays.where(F.col("dim") == d).select("series_id", "values")
        words = sfa.transform_windowing(m, arr_d)
        parts.append(_muse_keys(words, d, w, bigrams))
    allk = parts[0]
    for p in parts[1:]:
        allk = allk.unionByName(p)
    key_bags = bags.bag_of_keys(allk)
    feats = _to_vectors(key_bags, model.dictionary, model.n_features)
    all_ids = mv_arrays.select("series_id").distinct()
    from pyspark.ml.linalg import SparseVector, VectorUDT

    n_feats = model.n_features

    @F.udf(returnType=VectorUDT())
    def empty_vec():
        return SparseVector(n_feats, [], [])

    feats = all_ids.join(feats, "series_id", "left").select(
        "series_id", F.coalesce("features", empty_vec()).alias("features")
    )
    pred = model.lr_model.transform(feats)
    idx_map = feats.sparkSession.createDataFrame(
        [(float(i), lab) for i, lab in enumerate(model.label_map)],
        "prediction double, pred_label double",
    )
    return pred.join(F.broadcast(idx_map), "prediction").select("series_id", "pred_label")


def weasel_fit_grid(
    train_arrays: DataFrame,
    labels: DataFrame,
    windows: list[int],
    word_lengths: tuple[int, ...] = (4, 6),
    alphabet: int = 4,
    n_folds: int = 3,
    **kw,
) -> WeaselModel:
    """WEASEL grid fit (reference WEASELClassifier.fitWeasel,
    WEASELClassifier.java:214-263): grid over word lengths f, each
    scored by stratified k-fold CV accuracy of the logistic model;
    early exit on a perfect CV score; refit the winner on all data.
    (Reference grids norm ∈ {T,F} too; norm_mean passes through **kw.)
    """
    from pyspark.ml.classification import LogisticRegression

    folded = folds.stratified_folds(labels, n_folds).cache()
    best_f, best_acc = word_lengths[0], -1.0
    for f in word_lengths:
        model = weasel_fit(
            train_arrays, labels, windows, word_length=f, alphabet=alphabet, **kw
        )
        # CV accuracy on the fitted featurization (bags fixed, LR per fold)
        key_bags = _weasel_features(model.sfa_models, train_arrays)
        kept = select.filter_bags(key_bags, model.dictionary, key_col="key")
        feats = _to_vectors(kept, model.dictionary, model.n_features)
        lmap_df = labels.sparkSession.createDataFrame(
            [(float(lab), float(i)) for i, lab in enumerate(model.label_map)],
            "label double, label_idx double",
        )
        data = (
            feats.join(labels, "series_id")
            .join(F.broadcast(lmap_df), "label")
            .join(folded.select("series_id", "fold"), "series_id")
            .cache()
        )
        data.count()
        correct = total = 0
        for i in range(n_folds):
            tr = data.where(F.col("fold") != i)
            te = data.where(F.col("fold") == i)
            lr = LogisticRegression(
                featuresCol="features", labelCol="label_idx", maxIter=15,
                regParam=0.5, family="multinomial",
            )
            pred = lr.fit(tr).transform(te)
            r = pred.agg(
                F.sum((F.col("prediction") == F.col("label_idx")).cast("long")),
                F.count(F.lit(1)),
            ).collect()[0]
            correct += r[0] or 0
            total += r[1]
        data.unpersist()
        acc = correct / total if total else 0.0
        if acc > best_acc:
            best_acc, best_f = acc, f
        if acc == 1.0:  # reference early exit on perfect score
            break
    return weasel_fit(
        train_arrays, labels, windows, word_length=best_f, alphabet=alphabet, **kw
    )
