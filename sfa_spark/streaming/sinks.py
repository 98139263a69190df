"""Streaming UPSERT sink: materialize a latest-state table from an
append changelog stream (the CDC compaction q_latest_state performs in
batch, maintained incrementally).

Structured Streaming has no built-in MERGE sink, so the standard
pattern is ``foreachBatch``: each micro-batch is compacted map-side
(max_by per key — commutative, so batch boundaries cannot change the
result), merged with the current state table, and the new state is
published. On a lakehouse table format the ``_merge`` body becomes a
single MERGE INTO; here the publish is a VERSIONED-DIRECTORY + pointer
file protocol:

  * each merge writes a fresh ``v<batch_id>`` directory (never touches
    the live one);
  * the ``CURRENT`` pointer file is swapped with ``os.replace`` — an
    atomic single-file rename, so readers resolve either the old or
    the new version, never a half state (the crash-safe property a
    directory-rename pair does NOT have: dying between two renames
    would leave no live directory at all);
  * the applied batch id is stored IN the pointer, so a replayed
    micro-batch (checkpoint recovery re-delivers the last uncommitted
    batch) is detected and skipped — exactly-once for every column,
    including the accumulated ``n_versions`` count, without
    transactional storage;
  * power-loss durability and the reader race: the pointer bytes and
    the directory entries are fsynced around the swap, and the
    previous version directory is NOT deleted at publish — it is kept
    until the NEXT merge (N-1 retention), so a crash always leaves a
    durable resolvable version and a concurrent reader that resolved
    the old pointer can finish its scan.

Scale/state notes:
  * state size = one row per key — independent of stream length; the
    merge joins state with a compacted DELTA (≤ one row per key seen
    this batch), not with the raw batch.
  * at 100 TB state, partition the state table by bucket(key) and
    merge per-bucket; the versioned-parquet protocol is the
    single-node stand-in for a table-format commit.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CURRENT = "CURRENT"


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


def _read_pointer(state_dir: str) -> tuple[str | None, int]:
    """(live version dir name, last applied batch id)."""
    ptr = os.path.join(state_dir, CURRENT)
    if not os.path.exists(ptr):
        return None, -1
    vname, batch = open(ptr).read().strip().split(":")
    return vname, int(batch)


def upsert_latest(
    stream: DataFrame,
    state_dir: str,
    key_col: str = "user_id",
    checkpoint_dir: str | None = None,
):
    """Start the upsert stream; returns the StreamingQuery. Read the
    live state with ``read_state(spark, state_dir)``."""
    os.makedirs(state_dir, exist_ok=True)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        live, applied = _read_pointer(state_dir)
        if batch_id <= applied:
            return  # checkpoint replay of an already-published batch
        delta = _compact(batch_df, key_col)
        if live is not None:
            cur = spark.read.parquet(os.path.join(state_dir, live))
            merged = _compact(cur.unionByName(delta), key_col)
        else:
            merged = delta
        vname = f"v{batch_id}"
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, vname)
        )
        tmp = os.path.join(state_dir, CURRENT + ".tmp")
        with open(tmp, "w") as f:
            f.write(f"{vname}:{batch_id}")
            # durability, not just process-crash atomicity: fsync the
            # pointer bytes, then the directory entries, so a power
            # loss after the swap cannot leave CURRENT pointing at a
            # not-yet-durable version
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(state_dir, CURRENT))  # atomic
        dfd = os.open(state_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        # deferred deletion: keep the PREVIOUS version (N-1) and delete
        # only versions older than it, so (a) a machine crash always
        # leaves one durable version, (b) a concurrent reader that
        # resolved the old pointer can finish its scan — it is deleted
        # on the NEXT merge, not while it may still be live
        keep = {vname, live} if live is not None else {vname}
        for entry in os.listdir(state_dir):
            if (
                entry.startswith("v")
                and entry not in keep
                and os.path.isdir(os.path.join(state_dir, entry))
            ):
                shutil.rmtree(os.path.join(state_dir, entry), ignore_errors=True)

    writer = stream.writeStream.foreachBatch(_merge).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    vname, _ = _read_pointer(state_dir)
    if vname is None:
        raise ValueError(f"no published state under {state_dir}")
    return spark.read.parquet(os.path.join(state_dir, vname))


def _publish_version(
    state_dir: str, df: DataFrame, batch_id: int, live: str | None
) -> None:
    """The versioned-directory + fsynced-pointer publish shared by the
    foreachBatch MERGE sinks (see module docstring for the protocol:
    fresh v<batch_id> dir, atomic CURRENT swap with fsync'd bytes and
    directory entries, N-1 version retention)."""
    vname = f"v{batch_id}"
    df.write.mode("overwrite").parquet(os.path.join(state_dir, vname))
    tmp = os.path.join(state_dir, CURRENT + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"{vname}:{batch_id}")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(state_dir, CURRENT))  # atomic
    dfd = os.open(state_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    keep = {vname, live} if live is not None else {vname}
    for entry in os.listdir(state_dir):
        if (
            entry.startswith("v")
            and entry not in keep
            and os.path.isdir(os.path.join(state_dir, entry))
        ):
            shutil.rmtree(os.path.join(state_dir, entry), ignore_errors=True)


def scd2_sink(
    stream: DataFrame,
    state_dir: str,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    checkpoint_dir: str | None = None,
):
    """Streaming SCD2 maintenance: each micro-batch of the changelog
    folds into the live dimension-history table with
    temporal.scd2_apply (open rows close, new versions append,
    untouched keys pass through) under the same versioned-pointer
    publish protocol as upsert_latest — exactly-once via the applied
    batch id in the pointer, atomic swap, N-1 retention.

    Precondition (inherited from scd2_apply): batch arrival order must
    respect each key's version order — CDC sources deliver that;
    file sources must feed time-sliced files in order. The final state
    equals scd2_history over the whole changelog (q_stream_scd2's
    oracle is exactly the batch rebuild SQL).

    At 100 TB: persist the state bucketed by the key and the
    scd2_apply joins stay co-located (tests/test_bucketed_plans.py);
    the per-batch cost is O(delta), never O(history)."""
    import os as _os

    from sfa_spark.operators.temporal import scd2_apply, scd2_history

    _os.makedirs(state_dir, exist_ok=True)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        live, applied = _read_pointer(state_dir)
        if batch_id <= applied:
            return  # checkpoint replay of an already-published batch
        if batch_df.isEmpty():
            return
        if live is None:
            nxt = scd2_history(batch_df, key_col, order_cols)
        else:
            hist = spark.read.parquet(os.path.join(state_dir, live))
            nxt = scd2_apply(hist, batch_df, key_col, order_cols)
        _publish_version(state_dir, nxt, batch_id, live)

    writer = stream.writeStream.foreachBatch(_merge).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
