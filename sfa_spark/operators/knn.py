"""Bag-space 1-NN and Euclidean k-NN joins (SURVEY §2.7 C2, §2.8).

Reference parity:
  * BOSS 1-NN — BOSSEnsembleClassifier.predict
    (`/root/reference/src/main/java/sfa/classification/BOSSEnsembleClassifier.java:184-236`):
    asymmetric squared distance over the TEST bag's words only:
    dist(q, c) = Σ_{w ∈ bag(q)} (tf_q[w] − tf_c[w])²; argmin candidate.
    The reference accepts a neighbor only when `distance !=
    noMatchDistance && distance > 0` (line 216) — candidates sharing no
    word (or whose cross terms cancel to the no-match distance, or with
    an identical bag projection) are SKIPPED; a query with no accepted
    candidate gets no prediction (null label → scored incorrect).

Decomposition (so only matching words are ever joined):
    dist(q, c) = sumsq(q) + Σ_{w ∈ both} (tf_c[w]² − 2·tf_q[w]·tf_c[w])
The `dist != sumsq` acceptance rule means zero-overlap candidates can
never win, so the argmin runs over the sparse word-join pairs ONLY —
no cross join anywhere. Counts are integers so distances are EXACT
bigints — no float-ordering ambiguity.

Scale: the word-join is the only shuffle; its key distribution is the
word histogram (Zipfian) → AQE skew-join handles hot words.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def boss_1nn(
    test_bags: DataFrame,
    train_bags: DataFrame,
    loo: bool = False,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """1-NN by BOSS distance. Inputs: (series_id, word, cnt[, *keys]).

    Output: (series_id, nn_id, dist[, *keys]). loo=True skips
    self-matches (leave-one-out over a single corpus). `keys` are extra
    partition columns (e.g. norm/window/word-length) so one call
    resolves 1-NN for EVERY grid combination in a single plan — the
    grid-as-data ensemble fit path.

    Reference acceptance (BOSSEnsembleClassifier.java:216): a neighbor
    must have dist > 0 and dist != sumsq(q), so the argmin needs only
    the word-overlap pairs; queries with no accepted candidate emit no
    row (reference predicts null).
    """
    ks = list(keys)
    q = test_bags.select(
        *ks, F.col("series_id").alias("q_id"), "word", F.col("cnt").alias("q_cnt")
    )
    c = train_bags.select(
        *ks, F.col("series_id").alias("c_id"), "word", F.col("cnt").alias("c_cnt")
    )
    sumsq = q.groupBy(*ks, "q_id").agg(
        F.sum(F.col("q_cnt") * F.col("q_cnt")).alias("sumsq")
    )
    pairs = (
        q.join(c, [*ks, "word"])
        .groupBy(*ks, "q_id", "c_id")
        .agg(
            F.sum(
                F.col("c_cnt") * F.col("c_cnt")
                - F.lit(2) * F.col("q_cnt") * F.col("c_cnt")
            ).alias("corr")
        )
        .join(sumsq, [*ks, "q_id"])
        .withColumn("dist", F.col("sumsq") + F.col("corr"))
        .where((F.col("corr") != 0) & (F.col("dist") > 0))
    )
    if loo:
        pairs = pairs.where(F.col("q_id") != F.col("c_id"))
    w = Window.partitionBy(*ks, "q_id").orderBy(
        F.col("dist").asc(), F.col("c_id").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            *ks, F.col("q_id").alias("series_id"), F.col("c_id").alias("nn_id"), "dist"
        )
    )


def shotgun_1nn(
    query_arrays: DataFrame,
    corpus_arrays: DataFrame,
    window: int,
    norm_mean: bool = True,
) -> DataFrame:
    """Shotgun distance 1-NN (reference ShotgunClassifier.java:161-238):
    the query is cut into DISJOINT windows; each window's best (min) ED
    against ALL sliding windows of the candidate; distances summed;
    argmin candidate.

    Set-oriented decomposition (no per-pair Python):
      q-windows × c-windows pair distances (fold expression)
      → min over c-window per (q, c, q-window)
      → sum over q-windows per (q, c) → argmin c.
    The pair join is the scale hotspot — at 100 TB you'd block it with
    the LB-prune index (plans/index.py) instead of the full cross.
    Output: (series_id, nn_id, dist).
    """
    def _znorm_arr(col):
        mean = F.aggregate(col, F.lit(0.0), lambda a, x: a + x) / F.size(col)
        var = (
            F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x) / F.size(col)
            - mean * mean
        )
        std = F.sqrt(F.greatest(var, F.lit(0.0)))
        safe = F.when(std < 1e-8, F.lit(1.0)).otherwise(std)
        if norm_mean:
            return F.transform(col, lambda x: (x - mean) / safe)
        return F.transform(col, lambda x: x / safe)

    def _windows(arrays, id_alias, vec_alias, disjoint):
        n = F.size("values")
        if disjoint:
            starts = F.sequence(F.lit(0), (n / window).cast("int") - 1)
            offs = F.explode(starts).alias("wi")
            sl = F.slice("values", F.col("wi") * window + 1, window)
        else:
            starts = F.sequence(F.lit(0), n - window)
            offs = F.explode(starts).alias("wi")
            sl = F.slice("values", F.col("wi") + 1, window)
        return (
            arrays.where(n >= window)
            .select(F.col("series_id").alias(id_alias), offs, "values")
            .select(id_alias, "wi", _znorm_arr(sl).alias(vec_alias))
        )

    qw = _windows(query_arrays, "q_id", "qv", disjoint=True)
    cw = _windows(corpus_arrays, "c_id", "cv", disjoint=False).withColumnRenamed(
        "wi", "ci"
    )
    pair = qw.crossJoin(cw).select(
        "q_id",
        "c_id",
        "wi",
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("sq"),
    )
    best_per_qwin = pair.groupBy("q_id", "c_id", "wi").agg(F.min("sq").alias("minsq"))
    total = best_per_qwin.groupBy("q_id", "c_id").agg(F.sum("minsq").alias("dist"))
    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("c_id").asc())
    return (
        total.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(F.col("q_id").alias("series_id"), F.col("c_id").alias("nn_id"), "dist")
    )


def euclidean_knn_long(
    query_long: DataFrame, corpus_long: DataFrame, k: int
) -> DataFrame:
    """Brute-force ED k-NN between equal-length long-form series.

    Join on pos → Σ(a−b)² per pair → top-k per query. This is the
    correctness oracle for the indexed two-phase search (plans/index.py);
    at scale the join is pos-partitioned and the pair aggregation is the
    only wide shuffle.
    Output: (series_id, nn_id, dist, rk).
    """
    qq = query_long.select(
        F.col("series_id").alias("q_id"), "pos", F.col("value").alias("qv")
    )
    cc = corpus_long.select(
        F.col("series_id").alias("c_id"), "pos", F.col("value").alias("cv")
    )
    d = (
        qq.join(cc, "pos")
        .groupBy("q_id", "c_id")
        .agg(F.sum((F.col("qv") - F.col("cv")) ** 2).alias("sqdist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sqdist").asc(), F.col("c_id").asc())
    return (
        d.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            F.col("q_id").alias("series_id"),
            F.col("c_id").alias("nn_id"),
            F.sqrt("sqdist").alias("dist"),
            "rk",
        )
    )
