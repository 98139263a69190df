"""Structured Streaming: results of the streaming operators must equal
their batch analogues on the same data (availableNow trigger + memory
sink)."""

import time

import pytest
from pyspark.sql import functions as F

from sfa_spark.streaming import scoring


def _run_stream(q_name, stream_df, mode="update", timeout=120):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(q_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return q


def test_windowed_stats_matches_batch(spark, tmp_path):
    from sfa_spark.sources.events import normalize_ts

    src = str(tmp_path / "events")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.parquet(src)
    ev = normalize_ts(ev)

    stream = scoring.events_stream(spark, src)
    _run_stream("wstats", scoring.windowed_stats(stream, window="10 minutes"))
    got = spark.sql("select * from wstats")

    batch = (
        ev.withColumn("event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        .groupBy(
            F.col("user_id").alias("series_id"),
            F.window("event_time", "10 minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg("value").alias("mean"),
            F.stddev_pop("value").alias("std"),
        )
        .select("series_id", F.col("w.start").alias("w_start"), "n_events", "mean", "std")
    )
    g = {(r["series_id"], r["w_start"]): r["n_events"] for r in got.collect()}
    b = {(r["series_id"], r["w_start"]): r["n_events"] for r in batch.collect()}
    assert g == b and len(g) > 0


def test_score_bag_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "bags")
    bags = spark.createDataFrame(
        [(1, 10, 2), (1, 11, 1), (2, 10, 3), (2, 12, 5)],
        "series_id long, word long, cnt long",
    )
    bags.write.parquet(src)
    model = spark.createDataFrame(
        [(0.0, 10, 0.5), (0.0, 11, 0.1), (1.0, 12, 0.9)],
        "label double, word long, weight double",
    )
    stream = spark.readStream.schema("series_id long, word long, cnt long").parquet(src)
    _run_stream("scores", scoring.score_bag_stream(stream, model))
    got = {
        (r["series_id"], r["label"]): r["score"]
        for r in spark.sql("select * from scores").collect()
    }
    assert got[(1, 0.0)] == pytest.approx(2 * 0.5 + 1 * 0.1)
    assert got[(2, 1.0)] == pytest.approx(5 * 0.9)


def test_teaser_accept_streak(spark, tmp_path):
    src = str(tmp_path / "preds")
    preds = spark.createDataFrame(
        # series 1: 0,1,1 → accepted at snapshot 2 (streak of 2 ones)
        # series 2: 0,1,0 → never accepted
        [(1, 0, 0.0), (1, 1, 1.0), (1, 2, 1.0), (2, 0, 0.0), (2, 1, 1.0), (2, 2, 0.0)],
        "series_id long, snapshot long, pred_label double",
    )
    preds.write.parquet(src)
    stream = spark.readStream.schema(
        "series_id long, snapshot long, pred_label double"
    ).parquet(src)
    _run_stream("teaser", scoring.teaser_accept(stream, threshold=2), mode="append")
    got = {
        r["series_id"]: (r["pred_label"], r["accepted_at"])
        for r in spark.sql("select * from teaser").collect()
    }
    assert got == {1: (1.0, 2)}


def test_stream_sfa_words_equal_batch_across_microbatches(spark, tmp_path):
    """The stateful streaming word pipeline must emit EXACTLY the batch
    flagship words, with windows spanning micro-batch boundaries
    (3 time-ordered files, one per micro-batch)."""
    from sfa_spark import queries as Q
    from sfa_spark.streaming import words as SW

    sf = "/root/testdata/sf0.001"
    batch_words = {
        (r["series_id"], r["win"]): r["word"]
        for r in Q.q_sfa_words(spark, sf).collect()
    }
    stats = SW.fit_equi_width_stats(Q.coef_df(spark, sf))

    ev = spark.read.parquet(f"{sf}/events.parquet").orderBy("ts")
    n = ev.count()
    rows = ev.collect()
    src = str(tmp_path / "ev_stream")
    import os

    os.makedirs(src)
    third = n // 3
    for i, chunk in enumerate([rows[:third], rows[third : 2 * third], rows[2 * third :]]):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            f"{src}/part{i}", mode="overwrite"
        )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part*")
    )
    q = (
        SW.stream_sfa_words(stream, stats, w=16, l=4, a=4)
        .writeStream.format("memory")
        .queryName("swords")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["series_id"], r["win"]): r["word"]
        for r in spark.sql("select * from swords").collect()
    }
    assert got == batch_words


def test_class_tf_stream_accumulates_across_batches(spark, tmp_path):
    """BOSS VS streaming model update: running (label, word) tf equals
    the batch aggregate after two micro-batches."""
    import os

    src = str(tmp_path / "labeled_bags")
    os.makedirs(src)
    b1 = [(1, 10, 2, 0.0), (2, 10, 3, 1.0)]
    b2 = [(3, 10, 5, 0.0), (4, 11, 1, 0.0)]
    schema = "series_id long, word long, cnt long, label double"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(f"{src}/p0")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(f"{src}/p1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/p*")
    )
    _run_stream("ctf", scoring.class_tf_stream(stream))
    got = {
        (r["label"], r["word"]): r["tf"]
        for r in spark.sql("select * from ctf").collect()
    }
    assert got == {(0.0, 10): 7, (1.0, 10): 3, (0.0, 11): 1}


def test_stream_quality_gate_matches_batch(spark, tmp_path):
    """The streaming quality gate is a stateless projection — its
    output set must equal the batch filter exactly."""
    from sfa_spark.operators import text
    from sfa_spark.streaming import ingest

    src = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    stream = ingest.docs_stream(spark, src)
    q = _run_stream("singest_gate", ingest.stream_quality_gate(stream, 0.5), mode="append")
    got = {
        (r["doc_id"], r["lang"], r["n_tokens"], round(r["quality"], 9))
        for r in spark.table("singest_gate").collect()
    }
    batch = text.quality_score(
        text.token_stats(spark.read.parquet(src), keep=("lang",))
    ).where("quality >= 0.5")
    want = {
        (r["doc_id"], r["lang"], r["n_tokens"], round(r["quality"], 9))
        for r in batch.select("doc_id", "lang", "n_tokens", "quality").collect()
    }
    assert got == want and len(got) > 0


def test_stream_dedup_exact_first_seen(spark, tmp_path):
    """Streaming dropDuplicates on the content hash: one survivor per
    distinct text across micro-batches (dups in a LATER file are
    suppressed by state from the earlier one)."""
    from sfa_spark.streaming import ingest

    src = tmp_path / "docs"
    src.mkdir()
    b1 = [(0, "alpha beta gamma"), (1, "delta epsilon"), (2, "alpha beta gamma")]
    b2 = [(3, "delta epsilon"), (4, "unique text here")]
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.parquet(
        str(src / "b1")
    )
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.parquet(
        str(src / "b2")
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = _run_stream("sdedup", ingest.stream_dedup_exact(stream), mode="append")
    rows = spark.table("sdedup").collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha beta gamma", "delta epsilon", "unique text here"]
    assert len({r["content_hash"] for r in rows}) == 3


def test_row_minhash_bands_equal_batch(spark):
    """The row-local (streaming-safe) MinHash band keys must be
    bit-identical to the batch explode→groupBy path."""
    from sfa_spark.operators import dedup
    from sfa_spark.streaming import ingest

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely different text about spark engines here"),
        (3, "ab"),  # < k tokens → no shingles → no bands
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    a = {
        (r["doc_id"], r["band"]): r["band_key"]
        for r in ingest.row_minhash_bands(d, 8, 3, 2).collect()
    }
    b = {
        (r["doc_id"], r["band"]): r["band_key"]
        for r in dedup.band_keys(dedup.minhash_signatures(d, 8, 3), 2).collect()
    }
    assert a == b and len(a) == 12  # 3 docs x 4 bands; doc 3 bandless


def test_stream_near_dup_matches_batch(spark, tmp_path):
    """stream_near_dup (stream-static band join) == the batch band join
    on the same corpus."""
    import shutil

    from pyspark.sql import functions as F
    from sfa_spark.operators import dedup
    from sfa_spark.sources.events import load_table
    from sfa_spark.streaming import ingest

    sf = "/root/testdata/sf0.001"
    src = tmp_path / "docs"
    src.mkdir()
    shutil.copy(f"{sf}/documents.parquet", src / "documents.parquet")
    docs = load_table(spark, sf, "documents")
    ref = docs.where(F.col("doc_id") % 2 == 0)
    static_bands = dedup.band_keys(dedup.minhash_signatures(ref, 8, 3), 2)

    stream = ingest.docs_stream(spark, str(src))
    q = (
        ingest.stream_near_dup(stream, static_bands)
        .writeStream.format("memory")
        .queryName("t_neardup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["ref_doc_id"])
        for r in spark.table("t_neardup").collect()
    }
    all_bands = dedup.band_keys(dedup.minhash_signatures(docs, 8, 3), 2)
    want = {
        (r["doc_id"], r["ref_doc_id"])
        for r in all_bands.join(
            static_bands.select(
                F.col("doc_id").alias("ref_doc_id"), "band", "band_key"
            ),
            ["band", "band_key"],
        )
        .where(F.col("doc_id") != F.col("ref_doc_id"))
        .select("doc_id", "ref_doc_id")
        .distinct()
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_near_dup_watermarked_matches_unbounded(spark, tmp_path):
    """The long-running form (watermark + dropDuplicatesWithinWatermark,
    bounded state) must emit the same pair set as the unbounded form for
    in-horizon data."""
    from pyspark.sql import functions as F
    from sfa_spark.operators import dedup
    from sfa_spark.sources.events import load_table
    from sfa_spark.streaming import ingest

    sf = "/root/testdata/sf0.001"
    src = tmp_path / "docs_ts"
    docs = load_table(spark, sf, "documents")
    docs.withColumn(
        "arrived", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id"))
    ).write.parquet(str(src))
    ref = docs.where(F.col("doc_id") % 2 == 0)
    static_bands = dedup.band_keys(dedup.minhash_signatures(ref, 8, 3), 2)

    stream = ingest.docs_stream(spark, str(src))
    out = ingest.stream_near_dup(
        stream, static_bands, event_time_col="arrived", watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_neardup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["ref_doc_id"])
        for r in spark.table("t_neardup_wm").collect()
    }
    all_bands = dedup.band_keys(dedup.minhash_signatures(docs, 8, 3), 2)
    want = {
        (r["doc_id"], r["ref_doc_id"])
        for r in all_bands.join(
            static_bands.select(
                F.col("doc_id").alias("ref_doc_id"), "band", "band_key"
            ),
            ["band", "band_key"],
        )
        .where(F.col("doc_id") != F.col("ref_doc_id"))
        .select("doc_id", "ref_doc_id")
        .distinct()
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_lm_gate_matches_batch(spark, tmp_path):
    """Perplexity ingest gate: streaming score against a static bigram
    LM must equal the batch lm filter row-for-row — including docs
    with bigrams UNSEEN by the model (foreign-corpus backoff)."""
    from sfa_spark.operators import text as T
    from sfa_spark.streaming import ingest

    ref_rows = [(i, "spark makes big data small " * 3) for i in range(4)]
    new_rows = [
        (10, "spark makes big data small again"),
        (11, "totally novel words appear here now"),  # unseen context path
    ]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    model = T.bigram_lm_fit(ref)

    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(new_rows, "doc_id long, text string").write.parquet(
        str(src / "p"), mode="overwrite"
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "p")
    )
    q = (
        ingest.stream_lm_gate(stream, model, max_ppl=1e9)
        .writeStream.format("memory")
        .queryName("lmgate_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("lmgate_t").collect())
    want = sorted(
        tuple(r)
        for r in T.lm_score(
            spark.createDataFrame(new_rows, "doc_id long, text string"), model
        ).collect()
    )
    assert got == want and len(got) == 2
    # the in-model doc is far more predictable than the novel one
    by_id = {t[0]: t for t in got}
    assert by_id[10][3] < by_id[11][3]


def test_stream_sessionize_matches_batch_islands(spark, tmp_path):
    """Native session_window (streaming) == the batch lag/cumsum
    islands computation at µs precision, across micro-batch splits."""
    import numpy as np

    rng = np.random.default_rng(11)
    GAP_US = 1_800_000_000
    rows = []
    for u in range(6):
        t = 1_700_000_000_000_000
        for _ in range(30):
            # mix sub-gap and super-gap jumps; include exact-gap edges
            t += int(rng.choice([1_000, GAP_US - 1, GAP_US, GAP_US + 1]))
            rows.append((u, t * 1000, float(u)))  # ts in ns
    src = tmp_path / "ev"
    src.mkdir()
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    # two flat files → two micro-batches: sessions must merge across them
    import glob
    import shutil

    for name, half in (("a", "user_id < 3"), ("b", "user_id >= 3")):
        out = tmp_path / f"_{name}"
        df.where(half).coalesce(1).write.parquet(str(out))
        shutil.copy(glob.glob(str(out / "part-*.parquet"))[0],
                    str(src / f"{name}.parquet"))

    from sfa_spark.streaming import scoring

    stream = scoring.events_stream(spark, str(src))
    q = (
        scoring.session_stats(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("sess_t").collect())

    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("user_id").orderBy("t")
    batch = (
        df.select("user_id", F.expr("ts div 1000").alias("t"), "value")
        .withColumn("gap", F.col("t") - F.lag("t").over(w))
        .withColumn(
            "sid",
            F.sum(
                F.when(F.col("gap").isNull() | (F.col("gap") > GAP_US), 1)
                .otherwise(0)
            ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("t").alias("s_start_us"),
            (F.max("t") + GAP_US).alias("s_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .drop("sid")
    )
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_stream_sessionize_append_mode_watermark_eviction(spark, tmp_path):
    """Production semantics: APPEND mode emits a session exactly once,
    after the watermark passes its end — state for closed sessions is
    evicted rather than held forever (the complete-mode gate query
    trades this for sentinel-free bounded runs)."""
    import glob
    import shutil

    US = 1_000_000
    GAP_US = 60 * US  # 1-minute gap for a compact test
    base = 1_700_000_000_000_000
    # batch 1: two sessions for user 0 (split by > gap), batch 2: a far-
    # future event that pushes the watermark beyond both session ends,
    # batch 3: one more push so batch-2-closed state also flushes
    batches = [
        [(0, base + 0 * US), (0, base + 10 * US),        # session A
         (0, base + 200 * US)],                           # session B
        [(9, base + 100_000 * US)],
        [(9, base + 200_000 * US)],
    ]
    src = tmp_path / "ev"
    src.mkdir()
    for i, rows in enumerate(batches):
        out = tmp_path / f"_b{i}"
        spark.createDataFrame(
            [(u, t * 1000, 1.0) for u, t in rows],
            "user_id long, ts long, value double",
        ).coalesce(1).write.parquet(str(out))
        shutil.copy(glob.glob(str(out / "part-*.parquet"))[0],
                    str(src / f"b{i}.parquet"))

    from sfa_spark.streaming import scoring

    stream = (
        spark.readStream.schema("user_id long, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    from sfa_spark.sources.events import normalize_ts

    stream = normalize_ts(stream).withColumn(
        "event_time", F.expr("timestamp_micros(ts div 1000)")
    )
    q = (
        scoring.session_stats(stream, gap="1 minute", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["s_start_us"], r["s_end_us"], r["n_events"])
        for r in spark.table("sess_append").collect()
        if r["user_id"] == 0
    )
    # both user-0 sessions emitted exactly once with merged bounds
    assert got == [
        (0, base, base + 10 * US + GAP_US, 2),
        (0, base + 200 * US, base + 260 * US, 1),
    ], got


def test_stream_attribution_join_across_microbatches(spark, tmp_path):
    """Stream-stream click→purchase join == the batch range join, with
    clicks and their purchases split across micro-batch boundaries
    (time-ordered files, one per micro-batch) — proves click state is
    retained until watermark + horizon."""
    import glob
    import shutil

    HOUR_US = 3_600_000_000
    rows = []
    eid = 0
    base = 1_700_000_000_000_000
    for u in range(4):
        for k in range(6):
            ct = base + k * 3 * HOUR_US + u * 17_000_000
            rows.append((eid, ct * 1000, u, "click", 0.0)); eid += 1
            # one purchase inside the 6h horizon, one outside
            rows.append((eid, (ct + 2 * HOUR_US) * 1000, u, "purchase", 9.5)); eid += 1
            rows.append((eid, (ct + 7 * HOUR_US) * 1000, u, "purchase", 1.5)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    cut = base + 9 * HOUR_US
    src = tmp_path / "ev"
    src.mkdir()
    for name, half in (("a", f"ts div 1000 < {cut}"), ("b", f"ts div 1000 >= {cut}")):
        out = tmp_path / f"_{name}"
        df.where(half).coalesce(1).write.parquet(str(out))
        shutil.copy(glob.glob(str(out / "part-*.parquet"))[0],
                    str(src / f"{name}.parquet"))

    from pyspark.sql import functions as F

    from sfa_spark.sources.events import ensure_session_compat
    from sfa_spark.streaming import joins

    ensure_session_compat(spark)
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    )
    q = (
        joins.attribution_join(stream, horizon="6 hours")
        .writeStream.format("memory")
        .queryName("attr_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("attr_t").collect())

    c = df.where("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.expr("ts div 1000").alias("ct"))
    p = df.where("event_type = 'purchase'").select(
        F.col("user_id").alias("p_key"), F.col("event_id").alias("purchase_id"),
        F.expr("ts div 1000").alias("pt"), "value")
    batch = c.join(
        p, (F.col("user_id") == F.col("p_key")) & (F.col("pt") >= F.col("ct"))
        & (F.col("pt") <= F.col("ct") + 6 * HOUR_US)
    ).select("user_id", "click_id", "purchase_id",
             (F.col("pt") - F.col("ct")).alias("gap_us"), "value")
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want
    assert len(got) > 0
    # at least one pair must straddle the micro-batch cut (click in
    # file a, purchase in file b) — the state-retention case
    eid_ts = {r["event_id"]: r["ts"] // 1000 for r in df.collect()}
    assert any(
        eid_ts[click] < cut <= eid_ts[pur]
        for (_, click, pur, _, _) in got
    )


def test_stream_dedup_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Restart semantics: a checkpointed dedup stream stopped and
    restarted over new input must (a) not reprocess consumed files,
    (b) restore dedup state — duplicates of PRE-restart docs arriving
    AFTER the restart are still suppressed — and (c) deliver new docs
    exactly once to the file sink."""
    from sfa_spark.sources.events import ensure_session_compat
    from sfa_spark.streaming import ingest

    ensure_session_compat(spark)
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    schema = "doc_id bigint, text string"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            ingest.stream_dedup_exact(stream)
            .select("doc_id", "text", "content_hash")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch1 = spark.createDataFrame(
        [(0, "alpha doc"), (1, "beta doc"), (2, "alpha doc")], schema
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))
    # the file source needs files directly under src; write via move
    import glob
    import shutil

    for i, part in enumerate(glob.glob(str(src / "f1" / "part-*.parquet"))):
        shutil.move(part, str(src / f"a{i}.parquet"))
    shutil.rmtree(str(src / "f1"))
    run_once()
    got1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got1 == {0, 1}  # doc 2 is an in-batch duplicate of doc 0

    batch2 = spark.createDataFrame(
        [(3, "alpha doc"), (4, "gamma doc"), (5, "beta doc")], schema
    )
    batch2.coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))
    for i, part in enumerate(glob.glob(str(src / "f2" / "part-*.parquet"))):
        shutil.move(part, str(src / f"b{i}.parquet"))
    shutil.rmtree(str(src / "f2"))
    run_once()

    rows = spark.read.parquet(out).collect()
    # exactly once: no doc_id appears twice in the sink
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    # state recovered: 3 ("alpha doc") and 5 ("beta doc") are dups of
    # pre-restart docs and must be suppressed; 4 is new
    assert set(ids) == {0, 1, 4}


def test_stream_sketches_equal_batch_across_microbatches(spark, tmp_path):
    """The batch sketch aggregates (HLL registers, Count-Min grid) run
    on a stream UNCHANGED and must produce bit-identical state across
    micro-batch splits — max/sum per key are commutative monoids."""
    from pyspark.sql import functions as F

    from sfa_spark.operators import sketch

    rows = [(i, f"tok{i % 57} tok{i % 31} tok{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = tmp_path / "docs"
    src.mkdir()
    import glob
    import shutil

    for name, half in (("a", "doc_id < 100"), ("b", "doc_id >= 100")):
        out = tmp_path / f"_{name}"
        df.where(half).coalesce(1).write.parquet(str(out))
        shutil.copy(glob.glob(str(out / "part-*.parquet"))[0],
                    str(src / f"{name}.parquet"))

    def tokens(d):
        return d.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
        ).where(F.length("token") > 0)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    for qname, agg_fn in (
        ("shll_t", lambda d: sketch.hll_registers(d, "token", m=32)),
        ("scms_t", lambda d: sketch.countmin_build(d, "token", depth=2, width=64)),
    ):
        q = (
            agg_fn(tokens(stream))
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(tuple(r) for r in spark.table(qname).collect())
        want = sorted(tuple(r) for r in agg_fn(tokens(df)).collect())
        assert got == want and len(got) > 0, qname


def test_upsert_sink_multibatch_parity_and_idempotent(spark, tmp_path):
    """The foreachBatch upsert sink over several micro-batches equals
    the one-shot batch compaction, and re-applying a batch the state
    already absorbed is a no-op (replay safety)."""
    from sfa_spark.streaming import sinks

    rows = [
        (1, 100, 10, "a", 1.0),
        (2, 200, 10, "b", 2.0),
        (3, 150, 11, "a", 3.0),
        (4, 300, 10, "c", 4.0),
        (5, 250, 11, "b", 5.0),
        (6, 50, 12, "a", 6.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)
    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = sinks.upsert_latest(stream, state_dir)
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 3  # genuinely incremental
    got = {
        r["user_id"]: (r["event_id"], r["event_type"], r["n_versions"])
        for r in sinks.read_state(spark, state_dir).collect()
    }
    assert got == {10: (4, "c", 3), 11: (5, "b", 2), 12: (6, "a", 1)}
    # replay: re-deliver the whole stream into the SAME state dir (no
    # checkpoint → batch ids restart at 0). The pointer's applied-batch
    # watermark detects every batch as already published and skips it —
    # state is bit-identical INCLUDING the accumulated n_versions
    # (the exactly-once property checkpoint recovery relies on)
    stream2 = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
    )
    q2 = sinks.upsert_latest(stream2, state_dir)
    q2.awaitTermination(120)
    after = {
        r["user_id"]: (r["event_id"], r["event_type"], r["n_versions"])
        for r in sinks.read_state(spark, state_dir).collect()
    }
    assert after == got
    # crash-safety shape (r7 bucketed protocol): state is reachable via
    # the atomic CURRENT manifest; every bucket named in it exists and
    # holds its live version plus AT MOST one predecessor (per-bucket
    # N-1 retention closes the reader race and the power-loss window —
    # older versions are garbage-collected on the next touching merge)
    import os

    names = sorted(os.listdir(state_dir))
    assert sinks.CURRENT in names
    man = sinks._read_manifest(state_dir)
    assert man["applied"] >= 2 and man["buckets"]
    for b, v in man["buckets"].items():
        bdir = os.path.join(state_dir, f"bucket={b}")
        vdirs = [n for n in os.listdir(bdir) if n.startswith("v")]
        assert v in vdirs and len(vdirs) <= 2, (b, vdirs)


def test_observation_metrics_on_stream(spark, tmp_path):
    """The audit operator's claim that df.observe also instruments
    streams: quality metrics arrive per micro-batch in
    StreamingQueryProgress.observedMetrics — an ingest gate reports
    drop/null rates with zero extra scans."""
    from pyspark.sql import functions as F

    from sfa_spark.operators.audit import quality_metrics

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 2.0), (3, "c", None)],
        "id long, s string, v double",
    ).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
        .observe("ingest", *quality_metrics(["s", "v"]))
    )
    name = "obs_stream_sink"
    q = (
        stream.groupBy().agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    seen = {}
    for p in q.recentProgress:
        m = p["observedMetrics"].get("ingest")
        if m:
            for k in ("n_rows", "nulls_s", "nulls_v"):
                seen[k] = seen.get(k, 0) + m[k]
    assert seen == {"n_rows": 3, "nulls_s": 1, "nulls_v": 1}


def test_debounce_stream_greedy_anchor_and_cross_batch_state(spark, tmp_path):
    """Greedy semantics: the anchor re-arms only on EMIT — for the
    chain 0,10,20,25,45 with gap 15 it keeps [0, 20, 45], whereas the
    batch lag-to-previous rule would keep [0, 45] only (every other
    row is within 15 of its predecessor). Also proves the last-kept
    anchor survives across micro-batches (maxFilesPerTrigger=1,
    time-split files: 25 is dropped against anchor 20 from batch 1)."""
    from sfa_spark.streaming.ingest import debounce_stream

    schema = "event_id long, user_id long, event_type string, ts long"
    b1 = [(1, 7, "click", 0), (2, 7, "click", 10), (3, 7, "click", 20)]
    b2 = [(4, 7, "click", 25), (5, 7, "click", 45)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(tmp_path / "p0")
    )
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(tmp_path / "p1")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "p*"))
    )
    q = (
        debounce_stream(stream, gap_ns=15)
        .writeStream.format("memory")
        .queryName("sdeb_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(
        r["ts"] for r in spark.sql("select * from sdeb_test").collect()
    )
    # greedy with anchor: keep 0 (arm at 0) — 10, 20 within 15 of the
    # ANCHOR progression (10-0<=15 drop; 20-0>15 KEEP, re-arm at 20);
    # batch 2: 25-20<=15 drop; 45-20>15 keep.
    assert kept == [0, 20, 45]


def test_scd2_sink_multibatch_equals_rebuild_and_replay_safe(spark, tmp_path):
    """The foreachBatch SCD2 sink over ordered time-slice micro-batches
    equals the from-scratch scd2_history rebuild, and replaying the
    whole source against the published state (fresh checkpoint, same
    batch ids) is a no-op — the pointer's applied-batch-id guard."""
    import os
    import time

    from sfa_spark.operators.temporal import scd2_history
    from sfa_spark.streaming import sinks

    rows = []
    eid = 0
    for u in range(8):
        for k in range(1 + u % 4):
            rows.append((eid, 100 * k + u, u, f"s{k}", float(k)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    # two ordered time slices (ts < 200 first)
    for i, cond in enumerate(["ts < 200", "ts >= 200"]):
        p = f"{src}/slice_{i}.parquet"
        ev.where(cond).coalesce(1).write.parquet(p + ".dir")
        part = next(x for x in os.listdir(p + ".dir") if x.endswith(".parquet"))
        os.rename(os.path.join(p + ".dir", part), p)
        import shutil as _sh

        _sh.rmtree(p + ".dir")
        t = time.time() - 20 + i * 10
        os.utime(p, (t, t))
    state_dir = str(tmp_path / "state")
    schema = spark.read.parquet(src).schema

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = sinks.scd2_sink(stream, state_dir)
        q.awaitTermination(120)

    run()
    key = lambda r: (r["user_id"], r["event_id"])  # noqa: E731
    got = {
        key(r): (r["version"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in sinks.read_state(spark, state_dir).collect()
    }
    want = {
        key(r): (r["version"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_history(ev).collect()
    }
    assert got == want
    # replay the whole source with a FRESH checkpoint: batch ids 0..1
    # are <= the pointer's applied id, so the state must not change
    run()
    again = {
        key(r): (r["version"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in sinks.read_state(spark, state_dir).collect()
    }
    assert again == got


def test_merge_sinks_rewrite_only_touched_buckets(spark, tmp_path):
    """The r7 bucketed publish (VERDICT r6 task 3): a micro-batch whose
    keys land in a strict subset of buckets leaves every OTHER bucket's
    files byte-identical (same paths, same bytes — never opened for
    write), while still folding exactly like the one-shot batch
    rebuild. Covers both MERGE sinks, which share _publish_buckets.
    Protocol detail exercised: run 2 uses a fresh checkpoint, so its
    batch 0 is a REPLAY of already-applied content and must be skipped
    by the manifest's applied-id guard before batch 1 merges."""
    import hashlib
    import os
    import shutil as _sh

    from pyspark.sql import functions as F

    from sfa_spark.operators.temporal import scd2_history
    from sfa_spark.streaming import sinks

    n_buckets = 8

    def snapshot(state_dir):
        out = {}
        for root, _dirs, files in os.walk(state_dir):
            for fn in files:
                p = os.path.join(root, fn)
                rel = os.path.relpath(p, state_dir)
                out[rel] = hashlib.sha256(open(p, "rb").read()).hexdigest()
        return out

    keys = list(range(40))
    bmap = {
        r["k"]: r["b"]
        for r in spark.createDataFrame([(k,) for k in keys], "k long")
        .select("k", F.pmod(F.hash("k"), F.lit(n_buckets)).cast("int").alias("b"))
        .collect()
    }
    some_bucket = bmap[keys[0]]
    batch2_keys = [k for k in keys if bmap[k] == some_bucket]
    assert 0 < len(batch2_keys) < len(keys)

    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double"
    )
    rows1 = [(i, 100 + i, k, "a", 1.0) for i, k in enumerate(keys)]
    rows2 = [
        (1000 + i, 1000 + i, k, "b", 2.0) for i, k in enumerate(batch2_keys)
    ]

    def write_slice(src, name, rows, mtime):
        d = f"{src}/{name}.dir"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        part = next(x for x in os.listdir(d) if x.endswith(".parquet"))
        os.rename(os.path.join(d, part), f"{src}/{name}.parquet")
        _sh.rmtree(d)
        os.utime(f"{src}/{name}.parquet", (mtime, mtime))

    import time as _time

    for sink_fn, is_scd2 in ((sinks.upsert_latest, False), (sinks.scd2_sink, True)):
        tag = "scd2" if is_scd2 else "upsert"
        src = str(tmp_path / f"src_{tag}")
        os.makedirs(src)
        now = _time.time()
        write_slice(src, "b0", rows1, now - 20)
        state_dir = str(tmp_path / f"state_{tag}")
        sschema = spark.read.parquet(f"{src}/b0.parquet").schema

        def run():
            stream = (
                spark.readStream.schema(sschema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = sink_fn(stream, state_dir, n_buckets=n_buckets)
            q.awaitTermination(120)

        run()  # batch 0: all 40 keys
        man = sinks._read_manifest(state_dir)
        assert man["applied"] == 0
        before = snapshot(state_dir)

        write_slice(src, "b1", rows2, now - 10)
        run()  # replayed batch 0 skipped; batch 1 touches ONE bucket
        man = sinks._read_manifest(state_dir)
        assert man["applied"] == 1
        for b, v in man["buckets"].items():
            assert v == ("v1" if int(b) == some_bucket else "v0"), (b, v)
        after = snapshot(state_dir)
        touched_prefix = f"bucket={some_bucket}/"
        before_untouched = {
            p: h for p, h in before.items()
            if not p.startswith(touched_prefix) and p != sinks.CURRENT
        }
        after_untouched = {
            p: h for p, h in after.items()
            if not p.startswith(touched_prefix) and p != sinks.CURRENT
        }
        assert before_untouched == after_untouched  # byte-identical
        # touched bucket: N-1 retention → v0 AND v1 present after merge
        bdir = os.path.join(state_dir, f"bucket={some_bucket}")
        assert sorted(
            n for n in os.listdir(bdir) if n.startswith("v")
        ) == ["v0", "v1"]

        # result parity with the one-shot batch fold over ALL rows
        ev = spark.createDataFrame(rows1 + rows2, schema)
        if is_scd2:
            got = {
                (r["user_id"], r["event_id"]): (
                    r["version"], r["valid_from"], r["valid_to"], r["is_current"]
                )
                for r in sinks.read_state(spark, state_dir).collect()
            }
            want = {
                (r["user_id"], r["event_id"]): (
                    r["version"], r["valid_from"], r["valid_to"], r["is_current"]
                )
                for r in scd2_history(ev).collect()
            }
        else:
            got = {
                r["user_id"]: (r["event_id"], r["event_type"], r["n_versions"])
                for r in sinks.read_state(spark, state_dir).collect()
            }
            want = {
                r["user_id"]: (r["event_id"], r["event_type"], r["n_versions"])
                for r in ev.groupBy("user_id")
                .agg(
                    F.max_by("event_id", F.struct("ts", "event_id")).alias("event_id"),
                    F.max_by("event_type", F.struct("ts", "event_id")).alias("event_type"),
                    F.count(F.lit(1)).alias("n_versions"),
                )
                .collect()
            }
        assert got == want


def test_merge_sink_recovers_from_crashed_publish_attempt(spark, tmp_path):
    """Crash window: an attempt that staged and renamed bucket version
    dirs but died BEFORE the manifest swap leaves orphan v<batch> dirs.
    The replayed batch (manifest still at the old applied id) must
    replace the orphans and publish normally — not fail on the
    existing directory."""
    import os

    from pyspark.sql import functions as F

    from sfa_spark.streaming import sinks

    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double"
    )
    rows = [(i, 100 + i, i % 5, "a", 1.0) for i in range(20)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    # simulate the dead attempt: orphan v0 dirs with garbage content in
    # every bucket batch 0 will touch, and no manifest
    bmap = {
        r["b"]
        for r in spark.createDataFrame([(k,) for k in range(5)], "k long")
        .select(F.pmod(F.hash("k"), F.lit(8)).cast("int").alias("b"))
        .collect()
    }
    for b in bmap:
        orphan = os.path.join(state_dir, f"bucket={b}", "v0")
        os.makedirs(orphan)
        open(os.path.join(orphan, "garbage.parquet"), "w").write("junk")
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = sinks.upsert_latest(stream, state_dir, n_buckets=8)
    q.awaitTermination(120)
    got = {
        r["user_id"]: r["n_versions"]
        for r in sinks.read_state(spark, state_dir).collect()
    }
    assert got == {k: 4 for k in range(5)}
    # the garbage file is gone — orphans were replaced, not merged into
    for b in bmap:
        vdir = os.path.join(state_dir, f"bucket={b}", "v0")
        assert not os.path.exists(os.path.join(vdir, "garbage.parquet"))


def test_merge_sink_bucket_count_is_a_table_property(spark, tmp_path):
    """n_buckets is fixed by the FIRST publish and stored in the
    manifest: a later run passing a different value adopts the stored
    layout instead of silently mis-bucketing reads (which would leave
    stale duplicate keys in buckets the new assignment never probes)."""
    import json
    import os

    from sfa_spark.streaming import sinks

    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double"
    )
    src1 = str(tmp_path / "s1")
    src2 = str(tmp_path / "s2")
    spark.createDataFrame(
        [(i, 100 + i, i % 7, "a", 1.0) for i in range(21)], schema
    ).coalesce(1).write.parquet(src1)
    spark.createDataFrame(
        [(100 + i, 1000 + i, i % 7, "b", 2.0) for i in range(21)], schema
    ).coalesce(1).write.parquet(src2)
    state_dir = str(tmp_path / "state")
    sschema = spark.read.parquet(src1).schema

    q = sinks.upsert_latest(
        spark.readStream.schema(sschema).parquet(src1),
        state_dir,
        n_buckets=4,
    )
    q.awaitTermination(120)
    man = json.loads(open(os.path.join(state_dir, sinks.CURRENT)).read())
    assert man["n_buckets"] == 4

    # second run REQUESTS 16 buckets; the sink must keep the table's 4
    both = str(tmp_path / "both")
    os.makedirs(both)
    for i, s in enumerate([src1, src2]):
        part = next(
            p for p in os.listdir(s) if p.endswith(".parquet")
        )
        os.link(os.path.join(s, part), os.path.join(both, f"b{i}.parquet"))
        t = os.path.getmtime(os.path.join(both, f"b{i}.parquet"))
        os.utime(os.path.join(both, f"b{i}.parquet"), (t - 20 + i * 10,) * 2)
    q2 = sinks.upsert_latest(
        spark.readStream.schema(sschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(both),
        state_dir,
        n_buckets=16,
    )
    q2.awaitTermination(120)
    man = json.loads(open(os.path.join(state_dir, sinks.CURRENT)).read())
    assert man["n_buckets"] == 4
    assert all(int(b) < 4 for b in man["buckets"])
    got = {
        r["user_id"]: (r["event_type"], r["n_versions"])
        for r in sinks.read_state(spark, state_dir).collect()
    }
    # every key upgraded exactly once (no stale duplicates): batch 0 of
    # run 2 was a replay (skipped), batch 1 merged the 'b' rows
    assert got == {k: ("b", 6) for k in range(7)}


def test_read_key_scans_one_bucket(spark, tmp_path):
    """Point lookup: read_key returns exactly the full-scan rows for
    the key while its plan reads ONLY the key's bucket directory —
    the bucketed layout's O(state/n_buckets) payoff."""
    from pyspark.sql import functions as F

    from sfa_spark.streaming import sinks

    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double"
    )
    rows = [(i, 100 + i, i % 9, "a", float(i)) for i in range(45)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    state_dir = str(tmp_path / "state")
    q = sinks.upsert_latest(
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src),
        state_dir,
        n_buckets=8,
    )
    q.awaitTermination(120)

    for key in (0, 5, 8):
        got = sinks.read_key(spark, state_dir, key).collect()
        want = (
            sinks.read_state(spark, state_dir)
            .where(F.col("user_id") == key)
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        assert len(got) == 1
        # structural: the lookup's scan reads one bucket directory only
        import re

        files = sinks.read_key(spark, state_dir, key).inputFiles()
        assert files, "lookup must read some files"
        dirs = {re.search(r"bucket=\d+", f).group(0) for f in files}
        assert len(dirs) == 1, dirs
        all_dirs = {
            re.search(r"bucket=\d+", f).group(0)
            for f in sinks.read_state(spark, state_dir).inputFiles()
        }
        assert len(all_dirs) > 1  # the full scan touches many buckets

    # a key hashing to a never-written bucket yields an empty frame
    # (probe many candidates to find one, if any bucket is unused)
    man = sinks._read_manifest(state_dir)
    if len(man["buckets"]) < 8:
        used = {int(b) for b in man["buckets"]}
        for cand in range(100, 200):
            from pyspark.sql.types import LongType

            b = (
                spark.range(1)
                .select(sinks._bucket_of_lit(cand, 8, LongType()).alias("b"))
                .first()["b"]
            )
            if b not in used:
                assert sinks.read_key(spark, state_dir, cand).count() == 0
                break


def test_compact_state_preserves_rows_and_untouched_buckets(spark, tmp_path):
    """compact_state rewrites only fragmented buckets (fewer files, same
    rows), leaves compact buckets byte-identical, keeps the applied
    batch id (compaction is not a batch), and the NEXT merge lands
    exactly-once on the compacted layout."""
    import os

    from sfa_spark.streaming import sinks

    rows = [
        (i, 100 + i, uid, "a", float(i))
        for i, uid in enumerate([10, 11, 12, 13, 14, 15, 10, 11, 12, 13])
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "src")
    # several input files → several micro-batches → fragmented versions
    ev.repartition(5).write.parquet(src)
    state_dir = str(tmp_path / "state")
    chk = str(tmp_path / "chk")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sinks.upsert_latest(
        stream, state_dir, n_buckets=4, checkpoint_dir=chk
    ).awaitTermination(120)

    before_rows = sorted(
        tuple(r) for r in sinks.read_state(spark, state_dir).collect()
    )
    # AQE coalesces each tiny merge to one file per bucket, so fragment
    # ONE bucket by hand the way a wide merge would: rewrite its live
    # version as 4 files under a new version dir and flip the manifest
    # through the module's own commit (content identical)
    man_pre = sinks._read_manifest(state_dir)
    # the most-populated bucket (≥2 keys by pigeonhole: 6 keys, 4
    # buckets) so the 4-way repartition really produces ≥2 files
    from pyspark.sql import functions as F

    frag_b = str(
        sinks.read_state(spark, state_dir)
        .groupBy(sinks._bucket_of("user_id", man_pre["n_buckets"]).alias("b"))
        .count()
        .orderBy(F.desc("count"), "b")
        .first()["b"]
    )
    frag_live = os.path.join(
        state_dir, f"bucket={frag_b}", man_pre["buckets"][frag_b]
    )
    frag_new = os.path.join(state_dir, f"bucket={frag_b}", "v900")
    spark.read.parquet(frag_live).repartition(4).write.parquet(frag_new)
    man_pre["buckets"][frag_b] = "v900"
    sinks._commit_manifest(state_dir, man_pre)
    man0 = sinks._read_manifest(state_dir)

    def bucket_bytes(man):
        out = {}
        for b, v in man["buckets"].items():
            vd = os.path.join(state_dir, f"bucket={b}", v)
            out[b] = sorted(
                (f, os.path.getsize(os.path.join(vd, f)))
                for f in os.listdir(vd)
                if f.endswith(".parquet")
            )
        return out

    bytes0 = bucket_bytes(man0)
    done = sinks.compact_state(spark, state_dir, min_files=1)
    assert done, "expected at least one fragmented bucket"
    man1 = sinks._read_manifest(state_dir)
    assert man1["applied"] == man0["applied"]  # not a batch
    assert man1["n_buckets"] == man0["n_buckets"]
    for b, (nb, na) in done.items():
        assert na < nb, (b, nb, na)
        assert man1["buckets"][str(b)].startswith("v") and "c" in man1["buckets"][str(b)]
    bytes1 = bucket_bytes(man1)
    for b in man0["buckets"]:
        if int(b) not in done:  # untouched bucket: files never rewritten
            assert man1["buckets"][b] == man0["buckets"][b]
            assert bytes1[b] == bytes0[b]
    after_rows = sorted(
        tuple(r) for r in sinks.read_state(spark, state_dir).collect()
    )
    assert after_rows == before_rows

    # idempotent second pass: everything is compact now → no-op
    assert sinks.compact_state(spark, state_dir, min_files=1) == {}
    assert sinks._read_manifest(state_dir) == man1

    # the next merge still lands exactly-once on the compacted layout:
    # new files under the SAME checkpoint continue the batch numbering
    # past the state's applied watermark (a fresh checkpoint would
    # restart at 0 and be replay-skipped — that is the protocol)
    ev2 = spark.createDataFrame(
        [(99, 999, 10, "z", 9.9)],
        "event_id long, ts long, user_id long, event_type string, value double",
    )
    ev2.write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema(ev2.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sinks.upsert_latest(
        stream2, state_dir, checkpoint_dir=chk
    ).awaitTermination(120)
    got = {
        r["user_id"]: (r["event_id"], r["event_type"], r["n_versions"])
        for r in sinks.read_state(spark, state_dir).collect()
    }
    assert got[10] == (99, "z", 3)  # 2 pre-compaction versions + 1
    assert len(got) == 6


def test_upsert_sink_schema_agnostic(spark, tmp_path):
    """The upsert sink is not welded to the events shape: a documents-
    like stream keyed by doc_id, version-ordered by (rev, src_file),
    upserts with every other column riding along and n_versions
    accumulating — same protocol, different schema."""
    from sfa_spark.streaming import sinks

    rows = [
        (1, 1, "f0", "hello", "en"),
        (2, 1, "f0", "welt", "de"),
        (1, 2, "f1", "hello v2", "en"),
        (3, 1, "f1", "bonjour", "fr"),
        (1, 3, "f2", "hello v3", "uk"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, rev int, src_file string, body string, lang string"
    )
    src = str(tmp_path / "docs_src")
    df.repartition(3).write.parquet(src)
    state_dir = str(tmp_path / "docs_state")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sinks.upsert_latest(
        stream,
        state_dir,
        key_col="doc_id",
        n_buckets=4,
        order_cols=("rev", "src_file"),
    ).awaitTermination(120)
    state = sinks.read_state(spark, state_dir)
    assert state.columns == [
        "doc_id", "rev", "src_file", "body", "lang", "n_versions"
    ]
    got = {
        r["doc_id"]: (r["rev"], r["body"], r["lang"], r["n_versions"])
        for r in state.collect()
    }
    assert got == {
        1: (3, "hello v3", "uk", 3),
        2: (1, "welt", "de", 1),
        3: (1, "bonjour", "fr", 1),
    }
    # keyed point lookup works over the foreign schema too
    one = sinks.read_key(spark, state_dir, 1, key_col="doc_id").collect()
    assert len(one) == 1 and one[0]["body"] == "hello v3"


def test_read_asof_point_in_time_over_scd2_state(spark, tmp_path):
    """read_asof returns the version valid at the probe ts (zero or one
    row) and scans only the key's own bucket — the time-travel read the
    bucketed SCD2 layout exists for."""
    import os

    from sfa_spark.streaming import sinks

    # user 7 has versions at ts 7, 107, 207, 307 (k = 0..3)
    rows = []
    eid = 0
    for u in range(8):
        for k in range(1 + u % 4):
            rows.append((eid, 100 * k + u, u, f"s{k}", float(k)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    state_dir = str(tmp_path / "state")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    sinks.scd2_sink(stream, state_dir, n_buckets=4).awaitTermination(120)

    # before the key existed → no row
    assert sinks.read_asof(spark, state_dir, 7, 0).count() == 0
    # mid-interval: ts=150 falls in [107, 207) → version 2 (k=1)
    mid = sinks.read_asof(spark, state_dir, 7, 150).collect()
    assert len(mid) == 1 and mid[0]["event_type"] == "s1"
    assert mid[0]["valid_from"] == 107 and mid[0]["valid_to"] == 207
    # boundary: ts exactly at a version start belongs to that version
    at = sinks.read_asof(spark, state_dir, 7, 207).collect()
    assert len(at) == 1 and at[0]["event_type"] == "s2"
    # after the last version → the open (is_current) row
    cur = sinks.read_asof(spark, state_dir, 7, 10**9).collect()
    assert len(cur) == 1 and cur[0]["is_current"] and cur[0]["event_type"] == "s3"
    # single-bucket scan: the probe plan reads files from ONE bucket dir
    files = sinks.read_asof(spark, state_dir, 7, 150).inputFiles()
    assert files and len({f.split("/bucket=")[1].split("/")[0] for f in files}) == 1


def test_compact_fold_split_invariant_random(spark):
    """The sink's correctness core: _compact folded over ANY ordered
    batch split equals _compact of the whole changelog — the max_by
    fold is associative and n_versions accumulates exactly. Random
    data with ts ties (the (ts, event_id) struct breaks them) and
    random split points, driver-checked against a per-key python
    evaluation."""
    import numpy as np

    from sfa_spark.streaming.sinks import _compact

    rng = np.random.default_rng(7)
    rows = [
        (
            int(i),
            int((rng.integers(0, 50) // 7) * 7),  # forced ts ties
            int(rng.integers(0, 6)),
            str(rng.choice(["a", "b", "c"])),
            float(rng.integers(0, 100)),
        )
        for i in range(60)
    ]
    schema = "event_id long, ts long, user_id long, event_type string, value double"
    whole = spark.createDataFrame(rows, schema)
    want = {
        r["user_id"]: tuple(r)
        for r in _compact(whole, "user_id").collect()
    }
    # python oracle: max by (ts, event_id) per key + count
    for u in {r[2] for r in rows}:
        mine = [r for r in rows if r[2] == u]
        top = max(mine, key=lambda r: (r[1], r[0]))
        assert want[u] == (u, top[0], top[1], top[3], top[4], len(mine))
    for seed in (1, 2, 3):
        srng = np.random.default_rng(seed)
        cuts = sorted(srng.choice(range(1, 60), size=3, replace=False))
        parts = np.split(np.arange(60), cuts)
        state = None
        for part in parts:
            batch = spark.createDataFrame([rows[i] for i in part], schema)
            state = (
                _compact(batch, "user_id")
                if state is None
                else _compact(state.unionByName(_compact(batch, "user_id")), "user_id")
            )
        got = {r["user_id"]: tuple(r) for r in state.collect()}
        assert got == want, f"split seed {seed}"


def test_compaction_commit_discards_stale_buckets_after_concurrent_merge(
    spark, tmp_path
):
    """The r7 ADVICE race, made deterministic by the two-phase split:
    compaction's rewrite reads a snapshot manifest; a merge commits to
    one of the staged buckets before compaction's commit. The locked
    _commit_compaction must (a) DISCARD the stale staged bucket — the
    merge's committed pointer and data survive untouched, (b) still
    flip the bucket the merge did not supersede, and (c) carry the
    merge's applied id forward instead of reverting it."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from sfa_spark.streaming import sinks

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    nb = 4
    schema = "user_id long, event_id long, ts long, val string"

    def publish(rows, batch_id, man):
        df = spark.createDataFrame(rows, schema).withColumn(
            "_bucket", sinks._bucket_of("user_id", nb)
        )
        touched = sorted(
            r[0] for r in df.select("_bucket").distinct().collect()
        )
        sinks._publish_buckets(state_dir, df, touched, batch_id, man)
        return touched

    # batch 0: enough keys to hit >=2 distinct buckets
    rows0 = [(k, 1, 100, "a") for k in range(12)]
    man = {"applied": -1, "n_buckets": nb, "buckets": {}}
    publish(rows0, 0, man)
    man0 = sinks._read_manifest(state_dir)
    assert man0["applied"] == 0
    populated = sorted(man0["buckets"], key=int)
    assert len(populated) >= 2
    b_raced, b_clean = populated[0], populated[1]

    # phase 1 by hand for BOTH buckets (what compact_state does before
    # the lock): rewrite each live version into a 1-file stage dir
    staged = {}
    for b in (b_raced, b_clean):
        live = os.path.join(state_dir, f"bucket={b}", man0["buckets"][b])
        vname = f"v{man0['applied']}c1"
        stage = os.path.join(state_dir, f"_stage_{vname}_b{b}")
        spark.read.parquet(live).repartition(1).write.parquet(stage)
        staged[b] = (man0["buckets"][b], vname, stage, 99)

    # concurrent merge lands on b_raced before compaction commits: pick
    # a batch-0 key living in that bucket and upsert it
    key_in_raced = (
        spark.createDataFrame([(k,) for k in range(12)], "user_id long")
        .where(sinks._bucket_of("user_id", nb) == int(b_raced))
        .first()["user_id"]
    )
    full_bucket = (
        spark.read.parquet(
            os.path.join(state_dir, f"bucket={b_raced}", man0["buckets"][b_raced])
        )
        .withColumn(
            "val",
            F.when(F.col("user_id") == key_in_raced, F.lit("MERGED")).otherwise(
                F.col("val")
            ),
        )
        .withColumn("_bucket", F.lit(int(b_raced)).cast("int"))
    )
    sinks._publish_buckets(
        state_dir, full_bucket, [int(b_raced)], 1, sinks._read_manifest(state_dir)
    )
    man_after_merge = sinks._read_manifest(state_dir)
    merged_ver = man_after_merge["buckets"][b_raced]
    assert man_after_merge["applied"] == 1 and merged_ver == "v1"

    done = sinks._commit_compaction(state_dir, staged)
    man2 = sinks._read_manifest(state_dir)
    # (a) stale bucket: merge's pointer + data survive, stage is gone
    assert man2["buckets"][b_raced] == merged_ver
    assert int(b_raced) not in done
    assert not os.path.exists(staged[b_raced][2])
    assert not os.path.isdir(
        os.path.join(state_dir, f"bucket={b_raced}", staged[b_raced][1])
    )
    # (b) unsuperseded bucket flipped to its compacted version
    assert man2["buckets"][b_clean] == staged[b_clean][1]
    assert int(b_clean) in done
    # (c) applied id is the merge's, not reverted to the snapshot's
    assert man2["applied"] == 1
    got = {
        r["user_id"]: r["val"]
        for r in sinks.read_state(spark, state_dir).collect()
    }
    assert got[key_in_raced] == "MERGED"
    assert len(got) == 12

    # symmetric direction: a merge whose manifest SNAPSHOT predates a
    # compaction flip must not revert the compacted pointer of a bucket
    # it does not touch — _publish_buckets re-reads fresh under the lock
    stale_man = sinks._read_manifest(state_dir)
    live_clean = os.path.join(
        state_dir, f"bucket={b_clean}", man2["buckets"][b_clean]
    )
    vname2, stage2 = "v1c2", os.path.join(state_dir, f"_stage_v1c2_b{b_clean}")
    spark.read.parquet(live_clean).repartition(1).write.parquet(stage2)
    assert sinks._commit_compaction(
        state_dir, {b_clean: (man2["buckets"][b_clean], vname2, stage2, 99)}
    )
    full_raced2 = spark.read.parquet(
        os.path.join(state_dir, f"bucket={b_raced}", merged_ver)
    ).withColumn("_bucket", F.lit(int(b_raced)).cast("int"))
    sinks._publish_buckets(
        state_dir, full_raced2, [int(b_raced)], 2, stale_man
    )
    man3 = sinks._read_manifest(state_dir)
    assert man3["buckets"][b_clean] == vname2  # compaction flip survives
    assert man3["applied"] == 2
    shutil.rmtree(state_dir)
