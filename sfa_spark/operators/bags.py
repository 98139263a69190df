"""Bag-of-patterns construction (SURVEY §2.5, B1-B10).

Reference parity:
  * numerosity reduction — BOSS.createBagOfPattern
    (`/root/reference/src/main/java/sfa/transformation/BOSS.java:116-145`, reduction :137)
  * bag counting         — same
  * WEASEL unigram/bigram keys — WEASEL.createBagOfPatterns
    (`/root/reference/src/main/java/sfa/transformation/WEASEL.java:142-215`,
     unigram key = word<<highestBit | windowLength, bigram key =
     prevWord<<32 | word at offset − windowLength)

Everything here is lag/filter/groupBy — pure SQL, map-side combinable.
The words input is (series_id, win, word) sorted within series; the lag
window reuses the (series_id) partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def numerosity_reduce(words: DataFrame) -> DataFrame:
    """Drop a window's word when identical to the previous window's.

    Stabilizes against slow-changing signals flooding the bag
    (BOSS.java:137). lag over (series_id ORDER BY win) — no new shuffle.
    """
    w = Window.partitionBy("series_id").orderBy("win")
    return (
        words.withColumn("_prev", F.lag("word").over(w))
        .where(F.col("_prev").isNull() | (F.col("word") != F.col("_prev")))
        .drop("_prev")
    )


def bag_of_words(words: DataFrame) -> DataFrame:
    """(series_id, word) → counts. Sparse long-form histogram —
    the Spark-idiomatic equivalent of the reference's IntIntHashMap bag."""
    return words.groupBy("series_id", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def weasel_keys(
    words: DataFrame, window_length: int, highest_bit: int = 8, bigrams: bool = True
) -> DataFrame:
    """Emit WEASEL unigram (+ bigram) keys from one window-length's words.

    unigram key = word << highest_bit | window_length
    bigram  key = (word at win−window_length) << 32 | word
    The offset-by-window_length lag (not lag(1)) means bigrams pair
    non-overlapping adjacent windows (WEASEL.java:163-170).
    """
    uni = words.select(
        "series_id",
        (
            F.shiftleft(F.col("word"), highest_bit)
            .bitwiseOR(F.lit(window_length))
        ).alias("key"),
    )
    if not bigrams:
        return uni
    w = Window.partitionBy("series_id").orderBy("win")
    prev = F.lag("word", window_length).over(w)
    bi = (
        words.withColumn("prev", prev)
        .where(F.col("prev").isNotNull())
        .select(
            "series_id",
            F.shiftleft(F.col("prev"), 32).bitwiseOR(F.col("word")).alias("key"),
        )
    )
    return uni.unionByName(bi)


def bag_of_keys(keys: DataFrame) -> DataFrame:
    """Count WEASEL keys per series (the BagOfBigrams)."""
    return keys.groupBy("series_id", "key").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def merge_bags(*bags: DataFrame) -> DataFrame:
    """Union per-window-length bags and re-sum (reference mergeBobs,
    WEASELClassifier.java:324-335). In long form this is a trivial
    union + groupBy; usually unnecessary because keys embed the window
    length already."""
    out = bags[0]
    for b in bags[1:]:
        out = out.unionByName(b)
    return out.groupBy("series_id", "key").agg(F.sum("cnt").alias("cnt"))
