"""BOSS VS tf-idf class model (SURVEY §2.6, M1-M2).

Reference parity:
  * fit   — BOSSVS.createTfIdf (`/root/reference/src/main/java/sfa/transformation/BOSSVS.java:58-110`):
            tf = Σ counts over the class's series; idf uses
            df = #classes whose corpus contains the word;
            weight = (1 + log10(tf)) / log10(1 + C/df) (BOSSVS.java:95-97:
            `tfIdf = tfValue / idfValue` — a DIVISION, unusual but
            deliberate in the reference), forced to 0 when the word occurs
            in every class; each class vector L2-normalized.
  * score — BOSSVSClassifier.predict (`.../classification/BOSSVSClassifier.java:212-263`):
            score(sample, class) = Σ_words tf_sample · weight_class,
            argmax class.

Scale: the fitted matrix is (#classes × vocab) — small relative to data;
scoring broadcasts it, so predict is a broadcast join + one aggregation
(zero wide shuffles of the test corpus beyond its own bag groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fit_tfidf(
    bags_labeled: DataFrame,
    keys: tuple[str, ...] = (),
    n_classes: int | None = None,
) -> DataFrame:
    """(series_id, word, cnt, label[, *keys]) → ([*keys], label, word, weight).

    Pure SQL: two aggregations + a window-normalize. `keys` are grid
    columns (norm/window/f/fold) — one call fits a separate tf-idf
    model per combination, which is how the grid classifier runs the
    reference's whole CV loop as a single plan. Pass `n_classes` when
    some (keys) slice might not contain every class (the reference
    counts classes over the full train set, BOSSVS.java:60-66).
    """
    ks = list(keys)
    class_tf = bags_labeled.groupBy(*ks, "label", "word").agg(
        F.sum("cnt").alias("tf")
    )
    if n_classes is None:
        # in-plan broadcast scalar (a driver-side count() here would
        # re-execute the whole upstream chain as a second job)
        ncls = bags_labeled.groupBy(*ks).agg(
            F.countDistinct("label").cast("double").alias("n_classes")
        )
    # df as a count over the word partition: class_tf is aggregated
    # ONCE (the former groupBy-df + broadcast-join form re-ran the
    # class_tf aggregation on the broadcast branch every fit)
    raw = class_tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy(*ks, "word")).cast("double")
    )
    if n_classes is None:
        raw = (
            raw.join(F.broadcast(ncls), ks)
            if ks
            else raw.crossJoin(F.broadcast(ncls))
        )
    else:
        raw = raw.withColumn("n_classes", F.lit(float(n_classes)))
    raw = raw.withColumn(
        "weight",
        F.when(F.col("df") >= F.col("n_classes"), F.lit(0.0)).otherwise(
            (F.lit(1.0) + F.log10(F.col("tf")))
            / F.log10(F.lit(1.0) + F.col("n_classes") / F.col("df"))
        ),
    )
    norm = F.sqrt(
        F.sum(F.col("weight") * F.col("weight")).over(Window.partitionBy(*ks, "label"))
    )
    return raw.select(
        *ks,
        "label",
        "word",
        F.when(norm < 1e-12, F.lit(0.0)).otherwise(F.col("weight") / norm).alias("weight"),
    )


def score_tfidf(
    test_bags: DataFrame, tfidf: DataFrame, keys: tuple[str, ...] = ()
) -> DataFrame:
    """Predict argmax_class Σ tf_test · weight_class per test series.

    Parity note: the reference scores Σ tf·(weight + 1.0)
    (BOSSVSClassifier.java:236) — the +1 contributes Σ tf, which is
    class-INDEPENDENT per sample, so the argmax is identical to this
    formulation (reference default normMagnitudes=false). The reference
    tie-breaks by hash-map iteration order (nondeterministic); we use
    (score desc, label asc) — deterministic by construction.

    Broadcast the model. Output: ([*keys], series_id, pred_label, score).
    """
    ks = list(keys)
    scored = (
        test_bags.join(F.broadcast(tfidf), [*ks, "word"])
        .groupBy(*ks, "series_id", "label")
        .agg(F.sum(F.col("cnt") * F.col("weight")).alias("score"))
    )
    w = Window.partitionBy(*ks, "series_id").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(*ks, "series_id", F.col("label").alias("pred_label"), "score")
    )
