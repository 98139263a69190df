"""Structured Streaming surface (SURVEY §2.9).

The reference has no streaming runtime, but two capabilities are
stream-facing and become first-class here:

  * BOSS VS streaming scoring (README.md:239-242 motivates "mining
    streaming data… real-time predictive analytics"): the tf-idf class
    matrix is a small static table → scoring a live bag stream is a
    stream-static BROADCAST join + windowed aggregation. The model
    refreshes by periodic batch refit; scoring never stops.
  * TEASER early classification (README.md:402-405; TEASERClassifier
    predict loop `/root/reference/src/main/java/sfa/classification/TEASERClassifier.java:273-363`):
    per series, accept a prediction once the same label is seen v
    consecutive times — a keyed stateful operator
    (applyInPandasWithState) with the (label, streak) pair as state.

Watermark semantics are OUR extension (the reference has none):
late events beyond the watermark are dropped; windows close at
watermark passage. Documented at each call site.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def events_stream(spark, path: str, schema=None) -> DataFrame:
    """File-source stream over an events parquet directory. The stream
    schema is inferred from a static metadata read (streams must declare
    one), then `ts` is canonicalized to bigint nanoseconds and a proper
    timestamp `event_time` is derived for watermarking."""
    from sfa_spark.sources.events import ensure_session_compat, normalize_ts

    ensure_session_compat(spark)
    schema = schema or spark.read.parquet(path).schema
    raw = normalize_ts(spark.readStream.schema(schema).parquet(path))
    # integer `div`, not `/`: double division of ~1.7e18 ns loses the
    # last µs (53-bit mantissa), which shifts session/window boundaries
    # off the ns-exact oracles by 1 µs
    return raw.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )


def windowed_stats(
    stream: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked sliding/tumbling per-user window stats — the
    streaming analogue of operators/window.rolling_stats. Late rows
    beyond the watermark are dropped (extension semantics)."""
    win = F.window("event_time", window, slide) if slide else F.window(
        "event_time", window
    )
    return (
        stream.withWatermark("event_time", watermark)
        .groupBy(F.col("user_id").alias("series_id"), win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg("value").alias("mean"),
            F.stddev_pop("value").alias("std"),
        )
        .select("series_id", F.col("w.start").alias("w_start"), "n_events", "mean", "std")
    )


def score_bag_stream(bag_stream: DataFrame, tfidf_model: DataFrame) -> DataFrame:
    """Stream-static scoring: live (series_id, word, cnt) bags ⋈
    broadcast tf-idf → per-series class scores (update-mode aggregate).
    The static side is vocabulary-sized → broadcast join, no shuffle of
    the stream."""
    return (
        bag_stream.join(F.broadcast(tfidf_model), "word")
        .groupBy("series_id", "label")
        .agg(F.sum(F.col("cnt") * F.col("weight")).alias("score"))
    )


def class_tf_stream(bag_stream: DataFrame) -> DataFrame:
    """Streaming model maintenance for BOSS VS (README.md:239-242 —
    'cheap model updates'): running per-(label, word) term frequencies
    as an update-mode aggregation. A periodic foreachBatch snapshot
    feeds fit_tfidf to refresh the broadcast scoring matrix — tf
    accumulation is incremental, idf/normalize is the cheap batch hop.

    Input: labeled bag stream (series_id, word, cnt, label)."""
    return bag_stream.groupBy("label", "word").agg(
        F.sum("cnt").alias("tf")
    )


TEASER_OUTPUT = StructType(
    [
        StructField("series_id", LongType()),
        StructField("pred_label", DoubleType()),
        StructField("accepted_at", LongType()),
    ]
)
TEASER_STATE = StructType(
    [
        StructField("label", DoubleType()),
        StructField("streak", LongType()),
        StructField("seen", LongType()),
        StructField("done", LongType()),
    ]
)


def teaser_accept(
    pred_stream: DataFrame, threshold: int = 2
) -> DataFrame:
    """Early-classification accept: emit (series_id, pred_label,
    accepted_at) the first time a series' prediction repeats `threshold`
    consecutive snapshots (reference TEASERClassifier.java:304-330 —
    the one-class-SVM master is the batch layer; the streak rule is the
    streaming accept test).

    Input stream: (series_id long, snapshot long, pred_label double).
    State per series: (label, streak, seen, done).
    """

    def fn(key, pdfs, state: GroupState):
        (sid,) = key
        if state.exists:
            label, streak, seen, done = state.get
        else:
            label, streak, seen, done = None, 0, 0, 0
        out = []
        rows = pd.concat(list(pdfs)).sort_values("snapshot")
        for _, r in rows.iterrows():
            seen += 1
            if done:
                continue
            if label is not None and r["pred_label"] == label:
                streak += 1
            else:
                label, streak = float(r["pred_label"]), 1
            if streak >= threshold:
                done = 1
                out.append((int(sid), float(label), int(r["snapshot"])))
        state.update((label, streak, seen, done))
        if out:
            yield pd.DataFrame(
                out, columns=["series_id", "pred_label", "accepted_at"]
            )

    return pred_stream.groupBy("series_id").applyInPandasWithState(
        fn,
        outputStructType=TEASER_OUTPUT,
        stateStructType=TEASER_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_stats(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming sessionization via Spark's NATIVE session_window
    aggregation — the dynamic-gap analogue of windowed_stats and the
    streaming twin of the batch lag/cumsum sessionize (queries.py).
    Two events share a session iff their gap is AT MOST `gap`
    (session windows [t, t+gap] merge on inclusive overlap — asserted
    by the stream==batch islands test), so window.start = first event,
    window.end = last event + gap. In append mode, state for closed
    sessions is evicted by the watermark."""
    return (
        stream.withWatermark("event_time", watermark)
        .groupBy("user_id", F.session_window("event_time", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("s_start_us"),
            F.unix_micros(F.col("w.end")).alias("s_end_us"),
            "n_events",
            "sum_value",
        )
    )
