"""Streaming UPSERT sink: materialize a latest-state table from an
append changelog stream (the CDC compaction q_latest_state performs in
batch, maintained incrementally).

Structured Streaming has no built-in MERGE sink, so the standard
pattern is `foreachBatch`: each micro-batch is compacted map-side
(max_by per key — commutative, so replays and batch boundaries cannot
change the result), merged with the current state table, and the new
state is swapped in atomically. On a lakehouse table format this
`_merge` body becomes a single MERGE INTO; on plain parquet we write
next to the live state and rename — the same two-phase publish.

Scale/state notes:
  * state size = one row per key — independent of stream length; the
    merge joins state with a compacted DELTA (≤ one row per key seen
    this batch), not with the raw batch.
  * the merge function is IDEMPOTENT: re-delivering a micro-batch
    (checkpoint replay after failure) re-applies max_by over rows the
    state already absorbed — a no-op. That is what makes the sink
    effectively exactly-once without transactional storage.
  * at 100 TB state, partition the state table by bucket(key) and
    merge per-bucket; the parquet swap below is the single-node
    stand-in for that.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE = "state"
NEXT = "_next"


def _compact(df: DataFrame, key_col: str) -> DataFrame:
    """One row per key: all columns taken from the (ts, event_id)-max
    row, n_versions summed (so it accumulates across merges)."""
    ver = F.struct(F.col("ts"), F.col("event_id"))
    nv = (
        F.sum("n_versions")
        if "n_versions" in df.columns
        else F.count(F.lit(1))
    )
    return df.groupBy(key_col).agg(
        F.max_by("event_id", ver).alias("event_id"),
        F.max("ts").alias("ts"),
        F.max_by("event_type", ver).alias("event_type"),
        F.max_by("value", ver).alias("value"),
        nv.cast("bigint").alias("n_versions"),
    )


def upsert_latest(
    stream: DataFrame,
    state_dir: str,
    key_col: str = "user_id",
    checkpoint_dir: str | None = None,
):
    """Start the upsert stream; returns the StreamingQuery. The live
    state table is always readable at `{state_dir}/state`."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = _compact(batch_df, key_col)
        live = os.path.join(state_dir, STATE)
        nxt = os.path.join(state_dir, NEXT)
        if os.path.exists(live):
            cur = spark.read.parquet(live)
            merged = _compact(cur.unionByName(delta), key_col)
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(nxt)
        # two-phase publish: the fully-written next version replaces
        # the live directory in one rename pair
        old = live + ".old"
        if os.path.exists(live):
            os.rename(live, old)
        os.rename(nxt, live)
        shutil.rmtree(old, ignore_errors=True)

    writer = stream.writeStream.foreachBatch(_merge).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_state(spark, state_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(state_dir, STATE))
