"""Streaming MERGE sinks: materialize a latest-state table (upsert)
or an SCD2 dimension history from an append changelog stream — the
batch compactions q_latest_state / scd2_history perform in one shot,
maintained incrementally.

Structured Streaming has no built-in MERGE sink, so the standard
pattern is ``foreachBatch``: each micro-batch is compacted map-side
(max_by per key — commutative, so batch boundaries cannot change the
result), merged with the current state, and the new state is
published. On a lakehouse table format the merge body becomes a single
MERGE INTO; here the publish is a BUCKETED versioned-directory +
manifest protocol (r7 — replaces the r6 full-table rewrite, which was
O(history) I/O per micro-batch and the repo's last named 100 TB
scale-killer):

  * the state table is hash-partitioned into ``n_buckets`` buckets by
    ``pmod(hash(key), n_buckets)`` — the classic bucketed-table layout,
    recomputable from the key on any session (Spark's hash is
    deterministic Murmur3);
  * each bucket lives in ``bucket=<i>/v<batch_id>/`` version
    directories; a micro-batch rewrites ONLY the buckets that contain
    batch keys — per-batch publish I/O is O(state touched by the
    delta), not O(history). Compute was already O(delta) (the merge
    joins state with a compacted delta); now the I/O matches;
  * ONE manifest file (``CURRENT``, json) maps bucket → live version
    and records the last applied batch id. It is the single commit
    point: written to a temp file, fsynced, then ``os.replace``d — an
    atomic single-file rename, so readers resolve either the old or
    the new state across ALL buckets, never a half-merged one;
  * a replayed micro-batch (checkpoint recovery re-delivers the last
    uncommitted batch) is detected by the applied id in the manifest
    and skipped — exactly-once for every column, including the
    accumulated ``n_versions`` count, without transactional storage;
  * power-loss durability and the reader race: the manifest bytes and
    the directory entries are fsynced around the swap, and a touched
    bucket's PREVIOUS version directory is NOT deleted at publish — it
    is kept until the NEXT merge that touches the bucket (per-bucket
    N-1 retention), so a crash always leaves a durable resolvable
    version and a concurrent reader that resolved the old manifest can
    finish its scan. UNTOUCHED buckets' files are never opened or
    rewritten (tested byte-identical across a foreign batch).

Scale/state notes:
  * upsert state size = one row per key — independent of stream
    length; SCD2 state = one row per version. Both merges join state
    with a compacted DELTA (≤ one row per key seen this batch).
  * at 100 TB, ``n_buckets`` sizes the rewrite unit (state_bytes /
    n_buckets ≈ a few hundred MB per bucket); a skewed batch touching
    every bucket degrades to the full rewrite — the same worst case a
    table-format MERGE has. ``os.rename`` of staged bucket dirs is the
    single-node stand-in for an object-store manifest commit.
"""

from __future__ import annotations

import fcntl
import json
import os
import shutil
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CURRENT = "CURRENT"
LOCKFILE = "LOCK"


@contextmanager
def _state_lock(state_dir: str):
    """Exclusive advisory lock (fcntl flock on ``<state_dir>/LOCK``)
    serializing every manifest COMMIT section: merge publish and
    compaction each hold it across re-read-manifest → decide →
    _commit_manifest → _retain. The expensive work (Spark rewrite of
    bucket data) happens OUTSIDE the lock against staged directories;
    only the cheap pointer surgery is serialized, so a compaction
    running beside a live stream cannot clobber a merge's committed
    buckets (the r7 race: compaction's unlocked read-modify-write of
    CURRENT could overwrite a concurrent merge's applied id and bucket
    pointers, after which retention deleted the merged data). flock is
    per-open-file-description, so concurrent PROCESSES on one host
    serialize too; on a cluster the equivalent commit token is the
    object store's conditional put."""
    fd = os.open(
        os.path.join(state_dir, LOCKFILE), os.O_CREAT | os.O_RDWR, 0o644
    )
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _compact(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """One row per key: every column taken from the key's order_cols-max
    row (max_by against the version struct — schema-agnostic, so the
    sink upserts ANY table, not just the events shape), n_versions
    summed so it accumulates across merges. Column order is preserved
    from the input frame.

    REQUIREMENT: ``order_cols`` must be a unique key per row WITHIN a
    key (the default ``(ts, event_id)`` is; a bare non-unique timestamp
    is not). With ties, max_by picks an arbitrary tied row per
    partition, so the fold-over-splits invariant the sink's
    exactly-once story rests on is no longer deterministic — the same
    changelog could compact to different "latest" rows depending on
    batch boundaries. Callers with a non-unique ordering column must
    append a deterministic tiebreaker (an id, a line number) to
    ``order_cols``."""
    ver = F.struct(*[F.col(c) for c in order_cols])
    nv = (
        F.sum("n_versions")
        if "n_versions" in df.columns
        else F.count(F.lit(1))
    )
    return df.groupBy(key_col).agg(
        *[
            F.max_by(c, ver).alias(c)
            for c in df.columns
            if c not in (key_col, "n_versions")
        ],
        nv.cast("bigint").alias("n_versions"),
    )


def _bucket_of(key_col: str, n_buckets: int):
    return F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets)).cast("int")


def _read_manifest(state_dir: str) -> dict:
    """{"applied": last applied batch id, "buckets": {"<i>": "v<id>"},
    "n_buckets": bucket count the table was created with}."""
    ptr = os.path.join(state_dir, CURRENT)
    if not os.path.exists(ptr):
        return {"applied": -1, "buckets": {}}
    return json.loads(open(ptr).read())


def _effective_buckets(manifest: dict, requested: int) -> int:
    """The bucket count is a TABLE property, not a call parameter: key→
    bucket assignment must match the layout on disk, or a merge would
    read the wrong subset and silently duplicate keys across buckets.
    The first publish fixes it in the manifest; later calls adopt the
    stored value (re-bucketing requires a full rewrite, out of scope
    for a sink)."""
    return int(manifest.get("n_buckets", requested))


def _live_paths(
    state_dir: str, manifest: dict, buckets: list[int] | None = None
) -> list[str]:
    """Version directories live in the manifest — all buckets, or only
    the requested ones."""
    items = manifest["buckets"].items()
    if buckets is not None:
        want = {str(b) for b in buckets}
        items = [(b, v) for b, v in items if b in want]
    return [
        os.path.join(state_dir, f"bucket={b}", v) for b, v in items
    ]


def _publish_buckets(
    state_dir: str,
    merged: DataFrame,
    touched: list[int],
    batch_id: int,
    manifest: dict,
) -> None:
    """The bucketed commit shared by the MERGE sinks (module docstring
    for the protocol). ``merged`` must carry an int ``_bucket`` column
    and contain the COMPLETE new content of every touched bucket; only
    those buckets are staged, renamed into place, and flipped in the
    fsynced manifest. Untouched buckets' directories are never written.
    """
    vname = f"v{batch_id}"
    stage = os.path.join(state_dir, f"_stage_{vname}")
    # one job writes every touched bucket's new version, partition-split.
    # Align the write to the buckets first (r9, guide §6 output file
    # sizing / §2.2 fewer-larger tasks): without it the write stage
    # inherits the merge plan's partitioning — every upstream task
    # holding rows of a bucket opens its own file in that bucket's
    # version dir (measured 65 write tasks for a 1000-row state at
    # sf0.001, and one file per merge task per bucket accreting until
    # compact_state rewrites them). One partition per touched bucket
    # makes each version exactly one right-sized file — the bucket IS
    # the layout's rewrite unit (state_bytes/n_buckets by design).
    # Deterministic hash repartition (retry-safe, guide §2.5).
    (
        merged.repartition(max(len(touched), 1), "_bucket")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(stage)
    )
    # Rename + commit + retain under the state lock, against a FRESH
    # manifest read: a concurrent compact_state may have flipped
    # buckets (touched or not) since this merge snapshotted
    # ``manifest`` at batch start. The renames are INSIDE the lock —
    # if they happened outside it, a concurrent compaction's locked
    # _retain on the same bucket could sweep this merge's renamed-but-
    # uncommitted v<batch_id> dir (only the live and previous versions
    # are in its keep-set), and the merge would then commit a pointer
    # to a deleted directory. The expensive work (the parquet write to
    # the stage dir above) stays outside the lock; directory renames
    # are O(1) metadata ops. Starting from the fresh pointer map keeps
    # compaction's flips; the retention keep-set uses the fresh
    # previous version so a bucket compacted mid-merge retires its
    # pre-compaction dir, not the live compacted one. (Merges of one
    # stream are serialized by foreachBatch, so fresh.applied <
    # batch_id always; max() is defensive.)
    with _state_lock(state_dir):
        for b in touched:
            src = os.path.join(stage, f"_bucket={b}")
            if not os.path.isdir(src):  # merge produced no rows for b
                # cannot happen for upsert/scd2 (rows never disappear),
                # but stage an empty dir rather than dangle a manifest
                # entry
                os.makedirs(src, exist_ok=True)
            bdir = os.path.join(state_dir, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            dst = os.path.join(bdir, vname)
            # crash recovery: a previous attempt at this batch that
            # died between the renames and the manifest swap left an
            # orphan v<batch_id> dir. It cannot be live (the manifest's
            # applied id would have skipped this merge), so replace it.
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            os.rename(src, dst)
            dfd = os.open(bdir, os.O_RDONLY)
            try:  # directory entry of the new version must be durable
                os.fsync(dfd)
            finally:
                os.close(dfd)
        shutil.rmtree(stage, ignore_errors=True)
        fresh = _read_manifest(state_dir)
        fresh.setdefault("n_buckets", manifest["n_buckets"])
        prev = {str(b): fresh["buckets"].get(str(b)) for b in touched}
        new_manifest = {
            "applied": max(batch_id, fresh.get("applied", -1)),
            "n_buckets": fresh["n_buckets"],
            "buckets": {
                **fresh["buckets"],
                **{str(b): vname for b in touched},
            },
        }
        _commit_manifest(state_dir, new_manifest)
        # deferred deletion, per bucket: keep the new version AND the
        # previously live one (N-1 retention) so (a) a machine crash
        # always leaves one durable version, (b) a concurrent reader
        # that resolved the old manifest can finish its scan — the old
        # version dies on the NEXT merge that touches the bucket, not
        # while it may be live
        for b in touched:
            _retain(
                os.path.join(state_dir, f"bucket={b}"),
                {vname, prev[str(b)]} - {None},
            )


def _commit_manifest(state_dir: str, manifest: dict) -> None:
    """The single commit point shared by merge publish and compaction:
    fsync the manifest bytes, atomic-replace CURRENT, fsync the
    directory entry — durability, not just process-crash atomicity (a
    power loss after the swap cannot leave CURRENT pointing at a
    not-yet-durable version)."""
    tmp = os.path.join(state_dir, CURRENT + ".tmp")
    with open(tmp, "w") as f:
        f.write(json.dumps(manifest))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(state_dir, CURRENT))  # atomic commit
    dfd = os.open(state_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _retain(bdir: str, keep: set) -> None:
    """Delete every version directory of a bucket except ``keep``."""
    for entry in os.listdir(bdir):
        if entry.startswith("v") and entry not in keep:
            shutil.rmtree(os.path.join(bdir, entry), ignore_errors=True)


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    man = _read_manifest(state_dir)
    paths = _live_paths(state_dir, man)
    if not paths:
        raise ValueError(f"no published state under {state_dir}")
    return spark.read.parquet(*paths)


def read_key(
    spark: SparkSession,
    state_dir: str,
    key,
    key_col: str = "user_id",
) -> DataFrame:
    """Point lookup against the bucketed state: compute the key's
    bucket (the same Murmur3 `pmod(hash(key), n_buckets)` the writer
    used — evaluated through Spark so the function is identical by
    construction) and scan ONLY that bucket's live version directory.
    At 100 TB state this is the layout's payoff: a keyed read touches
    state/n_buckets bytes instead of the whole table. A key whose
    bucket has never been written returns an empty frame with the
    state schema."""
    man = _read_manifest(state_dir)
    if not man["buckets"]:
        raise ValueError(f"no published state under {state_dir}")
    nb = int(man["n_buckets"])
    # Murmur3 is TYPE-dependent (hash(0 as int) != hash(0 as long)), so
    # the probe literal must be cast to the state's key column type
    # before hashing — otherwise the lookup probes the wrong bucket.
    # One bucket's parquet footer is enough for the schema: don't list
    # every live path for a point lookup.
    any_path = _live_paths(state_dir, man)[0]
    ktype = spark.read.parquet(any_path).schema[key_col].dataType
    bucket = (
        spark.range(1)
        .select(_bucket_of_lit(key, nb, ktype).alias("b"))
        .first()["b"]
    )
    paths = _live_paths(state_dir, man, [bucket])
    if not paths:
        return read_state(spark, state_dir).where(F.lit(False))
    return spark.read.parquet(*paths).where(
        F.col(key_col) == F.lit(key).cast(ktype)
    )


def _bucket_of_lit(key, n_buckets: int, ktype):
    return F.pmod(
        F.hash(F.lit(key).cast(ktype)), F.lit(n_buckets)
    ).cast("int")


def upsert_latest(
    stream: DataFrame,
    state_dir: str,
    key_col: str = "user_id",
    checkpoint_dir: str | None = None,
    n_buckets: int = 8,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
):
    """Start the upsert stream; returns the StreamingQuery. Read the
    live state with ``read_state(spark, state_dir)``. Schema-agnostic:
    any stream upserts on ``key_col`` with versions ordered by
    ``order_cols`` (every other column rides along via max_by).
    ``order_cols`` must uniquely order rows within a key — see
    _compact's requirement note."""
    os.makedirs(state_dir, exist_ok=True)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        man = _read_manifest(state_dir)
        if batch_id <= man["applied"]:
            return  # checkpoint replay of an already-published batch
        nb = _effective_buckets(man, n_buckets)
        man["n_buckets"] = nb
        delta = _compact(batch_df, key_col, order_cols).withColumn(
            "_bucket", _bucket_of(key_col, nb)
        )
        delta.cache()
        try:
            touched = sorted(
                r[0] for r in delta.select("_bucket").distinct().collect()
            )
            if not touched:
                return  # empty batch: nothing to merge or commit
            live = _live_paths(state_dir, man, touched)
            if live:
                cur = spark.read.parquet(*live)
                merged = _compact(
                    cur.unionByName(delta.drop("_bucket")), key_col, order_cols
                ).withColumn("_bucket", _bucket_of(key_col, nb))
            else:
                merged = delta
            _publish_buckets(state_dir, merged, touched, batch_id, man)
        finally:
            delta.unpersist()

    writer = stream.writeStream.foreachBatch(_merge).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def scd2_sink(
    stream: DataFrame,
    state_dir: str,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    checkpoint_dir: str | None = None,
    n_buckets: int = 8,
):
    """Streaming SCD2 maintenance: each micro-batch of the changelog
    folds into the live dimension-history table with
    temporal.scd2_apply (open rows close, new versions append,
    untouched keys pass through) under the same bucketed-manifest
    publish protocol as upsert_latest — exactly-once via the applied
    batch id in the manifest, atomic swap, per-bucket N-1 retention;
    only buckets containing batch keys are read or rewritten.

    Precondition (structural since r7, enforced in-plan by scd2_apply):
    batch arrival order must respect each key's version order — CDC
    sources deliver that; file sources must feed time-sliced files in
    order. The final state equals scd2_history over the whole changelog
    (q_stream_scd2's oracle is exactly the batch rebuild SQL)."""
    from sfa_spark.operators.temporal import scd2_apply, scd2_history

    os.makedirs(state_dir, exist_ok=True)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        man = _read_manifest(state_dir)
        if batch_id <= man["applied"]:
            return  # checkpoint replay of an already-published batch
        nb = _effective_buckets(man, n_buckets)
        man["n_buckets"] = nb
        # cache the batch (r9): the touched-bucket discovery job fills
        # the cache, and scd2_apply's two batch subtrees (firsts +
        # new_rows) read it back instead of re-scanning the source —
        # one source scan per micro-batch instead of three (guide §5:
        # the delta is tiny by definition and reused thrice)
        b = batch_df.persist()
        try:
            touched = sorted(
                r[0]
                for r in b.select(
                    _bucket_of(key_col, nb).alias("_bucket")
                )
                .distinct()
                .collect()
            )
            if not touched:
                return  # empty batch: nothing to merge or commit (this
                # also covers the former isEmpty() pre-check — one fewer
                # Spark job per micro-batch)
            live = _live_paths(state_dir, man, touched)
            if live:
                hist = spark.read.parquet(*live)
                nxt = scd2_apply(hist, b, key_col, order_cols)
            else:  # no touched bucket has prior state — fresh histories
                nxt = scd2_history(b, key_col, order_cols)
            merged = nxt.withColumn("_bucket", _bucket_of(key_col, nb))
            _publish_buckets(state_dir, merged, touched, batch_id, man)
        finally:
            b.unpersist()

    writer = stream.writeStream.foreachBatch(_merge).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def compact_state(
    spark: SparkSession,
    state_dir: str,
    target_bytes: int = 128 << 20,
    min_files: int = 2,
) -> dict:
    """Per-bucket small-file compaction of the bucketed MERGE state —
    the OPTIMIZE pass the sinks need over time: every micro-batch
    publish writes a fresh version directory, so a hot bucket's live
    version accretes one file per merge task and a long-running stream
    leaves each bucket fragmented (the classic small-file problem the
    batch-table twin solves in sources/maintenance.compact_small_files).

    Each live bucket version holding more than ``min_files`` files AND
    more files than ceil(bytes/target_bytes) is rewritten into
    ceil(bytes/target_bytes) files as a NEW version directory and
    flipped in the manifest under the SAME commit protocol as a merge
    (_commit_manifest): atomic CURRENT swap, fsync'd durability,
    per-bucket N-1 retention (the pre-compaction version survives until
    the next write to the bucket), and a crash anywhere before the swap
    leaves the old version live with orphan staging cleaned up on the
    next attempt. The ``applied`` batch id is UNCHANGED — compaction is
    not a batch, so checkpoint-replay detection is unaffected.
    Buckets below the thresholds are never opened or rewritten.

    Concurrency (r8): safe to schedule beside the live stream. The
    expensive rewrite runs UNLOCKED against staged directories reading
    a snapshot manifest; the commit (_commit_compaction) then holds the
    state lock, re-reads the manifest, and flips ONLY buckets whose
    live version is still the one the rewrite read — a bucket a
    concurrent merge rewrote meanwhile keeps the merge's pointer and
    the now-stale staged rewrite is discarded (compaction is free to
    redo it next pass; losing idempotent maintenance work is the cheap
    side of the race). The merge publish holds the same lock across
    its own re-read → commit → retain, so neither writer can overwrite
    the other's committed pointers or applied id (the r7 VERDICT's
    unlocked read-modify-write). One residual reader caveat: a bucket
    compacted mid-scan retains its pre-compaction version only until
    the NEXT write to that bucket — the same N-1 window every reader
    already has.

    Row contents are untouched (rewrite = read + repartition + write);
    returns {bucket: (files_before, files_after)} for the buckets it
    rewrote. Compaction version dirs are named ``v<applied>c<k>`` —
    the 'v' prefix keeps them inside the retention sweep, the c-suffix
    cannot collide with a merge's ``v<batch_id>``, and ``k`` increments
    across repeated compactions at the same applied id.

    At 100 TB this is the maintenance job an operator schedules beside
    the stream: per-bucket, so its unit of work is state/n_buckets
    bytes, and bucket-parallel across a cluster.
    """
    from sfa_spark.sources.maintenance import dir_stats

    man = _read_manifest(state_dir)
    if not man["buckets"]:
        raise ValueError(f"no published state under {state_dir}")
    # Phase 1 (UNLOCKED, the expensive part): rewrite each fragmented
    # bucket's live version into a staged directory, reading the
    # snapshot manifest. A concurrent merge may flip buckets meanwhile
    # — phase 2 detects that per bucket and discards the stale rewrite.
    staged: dict[str, tuple[str, str, str, int]] = {}
    for b, ver in sorted(man["buckets"].items(), key=lambda kv: int(kv[0])):
        bdir = os.path.join(state_dir, f"bucket={b}")
        live = os.path.join(bdir, ver)
        n_files, total = dir_stats(live)
        n_out = max(1, -(-total // target_bytes))
        if n_files <= max(min_files, n_out):
            continue  # already compact — never opened
        seq = 1 + max(
            (
                int(e.rsplit("c", 1)[1])
                for e in os.listdir(bdir)
                if e.startswith("v") and "c" in e and e.rsplit("c", 1)[1].isdigit()
            ),
            default=0,
        )
        vname = f"v{man['applied']}c{seq}"
        stage = os.path.join(state_dir, f"_stage_{vname}_b{b}")
        shutil.rmtree(stage, ignore_errors=True)  # crashed prior attempt
        spark.read.parquet(live).repartition(n_out).write.mode(
            "overwrite"
        ).parquet(stage)
        staged[b] = (ver, vname, stage, n_files)
    if not staged:
        return {}
    return _commit_compaction(state_dir, staged)


def _commit_compaction(
    state_dir: str, staged: dict[str, tuple[str, str, str, int]]
) -> dict[int, tuple[int, int]]:
    """Phase 2 of compact_state, split out so tests can interleave a
    merge between the phases. Under the state lock: re-read the
    manifest; for each staged bucket, flip it ONLY if its live version
    is still the one the rewrite read (else discard the stale stage —
    a concurrent merge superseded it); rename staged dirs into place
    (inside the lock, so a merge's _retain can never sweep a
    renamed-but-uncommitted compaction dir); commit with the FRESH
    applied id and pointer map; retain N-1 per flipped bucket."""
    from sfa_spark.sources.maintenance import dir_stats

    done: dict[int, tuple[int, int]] = {}
    with _state_lock(state_dir):
        fresh = _read_manifest(state_dir)
        flips: dict[str, str] = {}
        old: dict[str, str] = {}
        for b, (ver, vname, stage, n_before) in staged.items():
            bdir = os.path.join(state_dir, f"bucket={b}")
            if fresh["buckets"].get(b) != ver:
                shutil.rmtree(stage, ignore_errors=True)  # stale rewrite
                continue
            dst = os.path.join(bdir, vname)
            if os.path.isdir(dst):  # crashed between rename and commit
                shutil.rmtree(dst)
            os.rename(stage, dst)
            dfd = os.open(bdir, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
            flips[b], old[b] = vname, ver
            done[int(b)] = (n_before, dir_stats(dst)[0])
        if not flips:
            return {}
        _commit_manifest(
            state_dir,
            {
                "applied": fresh["applied"],
                "n_buckets": fresh["n_buckets"],
                "buckets": {**fresh["buckets"], **flips},
            },
        )
        for b in flips:
            _retain(
                os.path.join(state_dir, f"bucket={b}"), {flips[b], old[b]}
            )
    return done


def read_asof(
    spark: SparkSession,
    state_dir: str,
    key,
    ts,
    key_col: str = "user_id",
) -> DataFrame:
    """Point-in-time lookup over a bucketed SCD2 state: the version of
    ``key`` that was valid at ``ts`` — ``valid_from <= ts AND
    (valid_to IS NULL OR ts < valid_to)``, the interval semantics
    scd2_history defines (operators/temporal.py:258). Rides read_key,
    so only the key's OWN bucket is scanned: at 100 TB dimension
    history this is the time-travel read the bucketed layout exists
    for — state/n_buckets bytes touched, not the table. Returns zero
    or one row (intervals within a key are disjoint by construction;
    zero when the key did not exist yet at ``ts``)."""
    hist = read_key(spark, state_dir, key, key_col)
    t = F.lit(ts).cast(hist.schema["valid_from"].dataType)
    return hist.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (t < F.col("valid_to")))
    )
