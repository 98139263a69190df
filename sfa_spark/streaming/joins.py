"""Stream-stream joins (Structured Streaming's hardest primitive,
SURVEY §2.9 extension).

The batch temporal joins (operators/temporal.py: as-of, interval,
funnel) answer "which right rows fall in each left row's window" over
a closed log. The streaming twin answers it CONTINUOUSLY: two live
event streams joined on a key plus an event-time range, with
watermarks bounding how long each side's rows wait in the state store
for late partners.

The canonical instance implemented here is click→purchase attribution
(every purchase within `horizon` after a click by the same user):

  * both sides carry a watermark — required by Spark to compute the
    state retention bound for stream-stream joins;
  * the range predicate is expressed on the watermarked EVENT-TIME
    columns themselves (not derived integers) — this is what lets the
    engine prove `click_time ∈ [purchase_time − horizon,
    purchase_time]` and evict click state older than
    watermark + horizon; a semantically identical predicate on bigint
    µs columns would force unbounded state;
  * inner join in append mode: a match emits as soon as both rows
    have arrived — no trigger-completion wait.

State size at 100 TB/day: each side retains only
(watermark + horizon) of history, hash-partitioned by the join key —
the same single shuffle the batch interval join pays, amortized over
the stream's lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    stream: DataFrame,
    key: str = "user_id",
    left_type: str = "click",
    right_type: str = "purchase",
    horizon: str = "30 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """All (click, purchase) pairs per `key` with
    purchase_time ∈ [click_time, click_time + horizon] — emitted from
    one event stream filtered into two watermarked sides (a genuine
    stream-stream self-join; two independent sources work the same).

    Output: (user_id, click_id, purchase_id, gap_us, value) where
    gap_us is the µs distance and value the purchase amount. Exact:
    event times are µs-truncated ns (timestamp_micros(ts div 1000)),
    so a batch SQL join on the same µs integers reproduces the rows
    bit-for-bit.
    """
    clicks = (
        stream.where(F.col("event_type") == left_type)
        .select(
            F.col(key),
            F.col("event_id").alias("click_id"),
            F.col("event_time").alias("click_time"),
        )
        .withWatermark("click_time", watermark)
    )
    purchases = (
        stream.where(F.col("event_type") == right_type)
        .select(
            F.col(key).alias("p_key"),
            F.col("event_id").alias("purchase_id"),
            F.col("event_time").alias("purchase_time"),
            F.col("value"),
        )
        .withWatermark("purchase_time", watermark)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"{key} = p_key AND purchase_time >= click_time "
            f"AND purchase_time <= click_time + INTERVAL {horizon}"
        ),
        "inner",
    )
    return joined.select(
        key,
        "click_id",
        "purchase_id",
        (
            F.unix_micros(F.col("purchase_time"))
            - F.unix_micros(F.col("click_time"))
        ).alias("gap_us"),
        "value",
    )
