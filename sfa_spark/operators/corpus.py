"""Corpus-preparation operators for LLM training-data pipelines:
repetition statistics, Gopher-style rule filtering, train/test
decontamination, and sequence packing.

These compose the text/dedup/sample primitives into the passes a real
pretraining pipeline runs over 100 TB:

  * repetition_stats / gopher_filter — the Rae et al. (Gopher, 2021)
    repetition + outlier rules, re-expressed as per-doc aggregates
    (token- and n-gram-based here: the synthetic corpus is single-line,
    so line-based rules would be degenerate). Pure SQL: one token pass
    + one bigram pass, both map-side combinable, joined per doc.
  * decontaminate — benchmark n-gram overlap flagging (the GPT-3
    appendix-C shape): an inverted shingle join, corpus-side grouped
    per doc. Never materializes the cross product; the benchmark side
    is distinct-shingled and the join is shingle-keyed, so at 100 TB
    the shuffle volume is bounded by matching shingles only.
  * sequence_pack — concat-and-chunk packing of documents into fixed
    token-budget training sequences. The global concatenation order is
    sharded (hash shards), so the cumulative sum is a window partitioned
    by shard — parallel across shards, no single-partition window. Each
    shard is an independent stream of sequences (standard practice:
    packing is per-shard/per-file, not global).

All outputs are engine-reproducible (md5 sharding, deterministic
orders) and every operator has a DuckDB oracle in oracles_text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sfa_spark.operators.text import with_tokens, shingles


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, bigram) with repetition — one row per occurrence."""
    d = with_tokens(docs)
    idx = F.when(
        F.size("toks") >= 2, F.sequence(F.lit(0), F.size("toks") - 2)
    ).otherwise(F.array())
    return d.select("doc_id", F.explode(idx).alias("i"), "toks").select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at("toks", F.col("i") + 1),
            F.element_at("toks", F.col("i") + 2),
        ).alias("bigram"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-doc repetition features (Gopher §A1.1 flavor, token-based):

      * dup_token_frac   — 1 − distinct/total tokens (vocabulary
        collapse: boilerplate and keyword-stuffed docs score high)
      * top_bigram_frac  — fraction of tokens covered by the single
        most frequent bigram (count × 2 / n_tokens)
      * dup_bigram_frac  — fraction of bigram occurrences whose bigram
        occurs more than once

    Two hash aggregates (token-keyed, bigram-keyed) reduced per doc and
    joined — both passes are map-side combinable and doc-partitioned,
    so the shuffle is vocabulary-sized per doc, never corpus-crossing.
    """
    tok = with_tokens(docs).select(
        "doc_id", F.explode("toks").alias("tok")
    )
    per_tok = tok.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tok_stats = per_tok.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
    per_bi = _bigrams(docs).groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bi_stats = per_bi.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        F.max("cnt").cast("bigint").alias("top_bigram_cnt"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("dup_bigram_occ"),
    )
    return (
        tok_stats.join(bi_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            (1.0 - F.col("n_distinct") / F.col("n_tokens")).alias(
                "dup_token_frac"
            ),
            F.coalesce(
                F.col("top_bigram_cnt") * 2.0 / F.col("n_tokens"), F.lit(0.0)
            ).alias("top_bigram_frac"),
            F.coalesce(
                F.col("dup_bigram_occ") / F.col("n_bigrams"), F.lit(0.0)
            ).alias("dup_bigram_frac"),
        )
    )


# Gopher-rule default bounds (token-based variants of Rae et al. §A1.1)
GOPHER_BOUNDS = dict(
    min_tokens=10,
    max_tokens=100_000,
    min_mean_tok_len=2.0,
    max_mean_tok_len=12.0,
    min_stopword_hits=1,
    max_dup_token_frac=0.9,
    max_top_bigram_frac=0.4,
)


def gopher_filter(docs: DataFrame, **bounds) -> DataFrame:
    """Per-doc rule verdicts + the composite keep decision.

    Output: (doc_id, ok_len, ok_tok_len, ok_stopwords, ok_repetition,
    kept) — each rule exposed so a pipeline can report WHICH rule
    dropped a document (the audit a real filter job must emit).
    One wide per-doc join of the two stat passes; row-local verdicts.
    """
    from sfa_spark.operators.text import token_stats

    b = {**GOPHER_BOUNDS, **bounds}
    ts = token_stats(docs)
    rep = repetition_stats(docs)
    j = ts.join(rep.drop("n_tokens"), "doc_id")
    ok_len = F.col("n_tokens").between(b["min_tokens"], b["max_tokens"])
    ok_tok_len = F.col("avg_tok_len").between(
        b["min_mean_tok_len"], b["max_mean_tok_len"]
    )
    ok_stop = (F.col("stopword_ratio") * F.col("n_tokens")) >= F.lit(
        float(b["min_stopword_hits"]) - 0.5
    )
    ok_rep = (F.col("dup_token_frac") <= b["max_dup_token_frac"]) & (
        F.col("top_bigram_frac") <= b["max_top_bigram_frac"]
    )
    return j.select(
        "doc_id",
        ok_len.cast("int").cast("bigint").alias("ok_len"),
        ok_tok_len.cast("int").cast("bigint").alias("ok_tok_len"),
        ok_stop.cast("int").cast("bigint").alias("ok_stopwords"),
        ok_rep.cast("int").cast("bigint").alias("ok_repetition"),
        (ok_len & ok_tok_len & ok_stop & ok_rep)
        .cast("int")
        .cast("bigint")
        .alias("kept"),
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_hashes: int = 7,
    bits_per_item: int = 10,
    max_bits: int = 1 << 27,
) -> tuple[list[int], int]:
    """Build a Bloom filter over a key column DISTRIBUTEDLY and return
    it as (words, m_bits) where words is a list of m_bits/64 bigints.

    Shape: each key explodes to n_hashes probe positions
    (xxhash64(key, i) mod m), positions reduce to set bits via a
    map-side-combinable bit_or grouped by 64-bit word index — the
    driver only ever sees the FINISHED bitmap (m_bits/8 bytes, capped
    at max_bits/8 = 16 MiB by default), never the keys. 10 bits/item
    with 7 hashes gives ~1% false positives; false negatives are
    impossible, so an exact verify step downstream keeps results exact.
    """
    n = keys.count()
    m_bits = max(1024, n * bits_per_item)
    m_bits = min(((m_bits + 63) // 64) * 64, max_bits)
    probes = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits)
                    )
                    for i in range(n_hashes)
                ]
            )
        ).alias("p")
    )
    rows = (
        probes.select(
            F.floor(F.col("p") / F.lit(64.0)).cast("int").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))"
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[int(r["w"])] = int(r["bits"])
    return words, m_bits


# Above this many 64-bit words the bitmap stops inlining as a literal:
# PySpark builds list literals element-by-element over py4j (~0.15 ms
# each), so a 2M-word bitmap would take ~5 min of driver time. Larger
# bitmaps ride a broadcast ONE-ROW frame instead — fixed broadcast
# cost, no per-element driver work.
BLOOM_LIT_WORDS_CAP = 4096


def bloom_contains(
    col: Column, words: list[int] | Column, m_bits: int, n_hashes: int = 7
) -> Column:
    """Membership test against a bloom_build() bitmap, as a row-local
    codegen'd boolean column — no shuffle. `words` is the bitmap as a
    python list (inlined as one array literal — small bitmaps only,
    see BLOOM_LIT_WORDS_CAP) or a Column referencing an array<bigint>
    (the broadcast-frame path used by bloom_prefilter)."""
    arr = F.lit(words) if isinstance(words, list) else words
    cond = F.lit(True)
    for i in range(n_hashes):
        p = F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
        word = F.element_at(arr, F.floor(p / F.lit(64.0)).cast("int") + 1)
        bit = F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            F.pmod(p, F.lit(64)).cast("int"),
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_prefilter(
    df: DataFrame,
    col: str,
    words: list[int],
    m_bits: int,
    n_hashes: int = 7,
) -> DataFrame:
    """Keep rows whose `col` MAY be in the bloom set (no false
    negatives). Small bitmaps inline as a literal; above
    BLOOM_LIT_WORDS_CAP the bitmap broadcasts as a one-row frame
    (measured: one-time ~seconds broadcast at the 16 MiB cap,
    row-count-independent — vs minutes of py4j literal construction)."""
    if len(words) <= BLOOM_LIT_WORDS_CAP:
        return df.where(bloom_contains(F.col(col), words, m_bits, n_hashes))
    bdf = df.sparkSession.createDataFrame(
        [(words,)], "_bloom_words array<bigint>"
    )
    cond = bloom_contains(
        F.col(col), F.col("_bloom_words"), m_bits, n_hashes
    )
    return (
        df.crossJoin(F.broadcast(bdf)).where(cond).drop("_bloom_words")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    tau: float = 0.5,
    bloom: bool = False,
    n_hashes: int = 7,
    bits_per_item: int = 10,
) -> DataFrame:
    """Flag corpus documents whose word k-gram shingles overlap a
    benchmark (eval) set — train/test decontamination (GPT-3 App. C /
    PaLM style, shingle-based).

    Output: (doc_id, n_shingles, n_contaminated, contam_frac, flagged).

    Scale shape: benchmark shingles are DISTINCT'd (set semantics)
    then joined on the shingle key — an inverted-index probe. The
    shuffle carries only shingles that actually match; no doc×doc
    pairing ever exists. With a small benchmark the join side
    broadcasts; Catalyst/AQE decides from stats.

    bloom=True prepends a row-local Bloom prefilter (bloom_build over
    the benchmark shingles, bloom_contains on the corpus side) BEFORE
    the join: at 100 TB the corpus-side shuffle then carries only
    (matching + ~1% false-positive) shingles instead of every corpus
    shingle, and the exact join afterwards removes the false positives
    — output is bit-identical to bloom=False. This is the explicit
    form of Spark's runtime row-level bloom filtering, kept explicit
    because it also prunes when the join degenerates to broadcast and
    because the filter survives across reuses of the shingle stream.
    """
    cs = shingles(corpus, k=k)
    bs = shingles(benchmark, k=k).select("shingle").distinct()
    sizes = cs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    probe = cs
    if bloom:
        # the benchmark shingle set is consumed three times on this
        # path (bitmap sizing count, probe-position scan, exact verify
        # join): materialize it once. Eager localCheckpoint = the same
        # mechanism dedup_groups uses; benchmark-sized, not corpus-sized.
        bs = bs.localCheckpoint(eager=True)
        words, m_bits = bloom_build(
            bs, "shingle", n_hashes=n_hashes, bits_per_item=bits_per_item
        )
        probe = bloom_prefilter(cs, "shingle", words, m_bits, n_hashes)
    hits = (
        probe.join(bs, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminated"))
    )
    out = (
        sizes.join(hits, "doc_id", "left")
        .withColumn(
            "n_contaminated", F.coalesce("n_contaminated", F.lit(0)).cast("bigint")
        )
        .withColumn(
            "contam_frac", F.col("n_contaminated") / F.col("n_shingles")
        )
    )
    return out.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        "contam_frac",
        (F.col("contam_frac") >= tau).cast("int").cast("bigint").alias("flagged"),
    )


def sequence_pack(
    docs: DataFrame,
    ctx_len: int = 128,
    n_shards: int = 4,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated in
    a deterministic order and cut into ctx_len-token training
    sequences; each doc reports which sequences it lands in.

    Output per doc: (doc_id, shard, n_tokens, start_tok, seq_first,
    seq_last) where start_tok is the doc's token offset within its
    shard's stream and seq_* = floor(offset / ctx_len) of its first /
    last token.

    Scale shape: a single global concatenation order would force a
    one-partition window. Instead docs are hash-sharded (md5 — engine-
    reproducible) and packed per shard: the running sum is a window
    PARTITIONED by shard, ordered by doc_id — parallel across shards.
    Each shard is an independent sequence stream (how real pipelines
    pack: per output file), so n_shards is the parallelism axis — at
    100 TB set it to the output file count (10⁴–10⁵).
    """
    d = with_tokens(docs).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit(salt), F.col("doc_id").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(n_shards),
        ).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        .cast("bigint")
        .alias("start_tok"),
    ).select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_tok",
        F.floor(F.col("start_tok") / ctx_len).cast("bigint").alias("seq_first"),
        F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / ctx_len)
        .cast("bigint")
        .alias("seq_last"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG-style overlapping chunking: split each document into
    fixed-size token windows of `chunk_tokens`, starting every `stride`
    tokens (stride < chunk_tokens ⇒ overlap of chunk_tokens − stride).
    The final window may be short; every token is covered.

    Output: (id, chunk_id, start_tok, chunk_len, chunk_text) — one row
    per chunk, chunk_id = start_tok / stride.

    Shape: fully row-local — tokenize, generate the start offsets with
    `sequence`, explode, slice, re-join — zero shuffles, zero Python.
    At 100 TB this is a pure map stage that pipelines into whatever
    sink or embedding pass follows; output row count is
    ~n_tokens/stride per doc, bounded and predictable."""
    if not (0 < stride <= chunk_tokens):
        raise ValueError("need 0 < stride <= chunk_tokens")
    toks = F.split(F.col(text_col), " ")
    d = docs.select(
        id_col, toks.alias("_toks"), F.size(toks).alias("_n")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(int(stride))
    )
    d = d.select(id_col, "_toks", F.explode(starts).alias("_start"))
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, F.lit(int(chunk_tokens)))
    return d.select(
        id_col,
        (F.col("_start") / stride).cast("int").alias("chunk_id"),
        F.col("_start").cast("int").alias("start_tok"),
        F.size(chunk).cast("int").alias("chunk_len"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def cdc_chunks(
    docs: DataFrame,
    divisor: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking: chunk boundaries fall AFTER tokens
    whose content hash ≡ 0 (mod `divisor`), so expected chunk length is
    `divisor` tokens and — unlike fixed-stride chunking — boundaries
    are stable under insertions/deletions elsewhere in the document
    (the rsync/LBFS trick, token-granular). Identical chunk_hash across
    documents ⇒ shared content, even at shifted offsets: the basis of
    shift-robust dedup.

    The token hash is an explicit polynomial fold over code points
    ((acc·31 + code) mod 2³¹) rather than an engine hash builtin, so
    any engine — and the DuckDB oracle — derives the SAME boundaries
    from the formula alone.

    Output: (id, cdc_id, start_tok, n_toks, chunk_hash) — chunk_hash =
    md5 of the space-joined chunk.

    Shape: tokenize + hash are row-local; the boundary scan is a lag +
    running-sum window and the chunk rebuild a groupBy, both on the
    SAME (doc) key — one Exchange total, reused by window and
    aggregation alike. Per-doc state is bounded by document length."""
    toks = F.split(F.col(text_col), " ")
    d = docs.select(id_col, F.posexplode(toks).alias("pos", "tok"))
    d = d.withColumn(
        "_h",
        F.expr(
            "aggregate(split(tok, ''), 0L, "
            "(acc, c) -> (acc * 31 + ascii(c)) % 2147483648)"
        ),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    is_new = (F.col("pos") == 0) | (
        F.lag((F.col("_h") % divisor == 0).cast("int")).over(w) == 1
    )
    d = d.withColumn(
        "cdc_id",
        F.sum(is_new.cast("int"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        - 1,
    )
    chunk_toks = F.transform(
        F.sort_array(F.collect_list(F.struct("pos", "tok"))), lambda s: s.tok
    )
    return d.groupBy(id_col, F.col("cdc_id").cast("int").alias("cdc_id")).agg(
        F.min("pos").cast("int").alias("start_tok"),
        F.count(F.lit(1)).cast("int").alias("n_toks"),
        F.md5(F.array_join(chunk_toks, " ")).alias("chunk_hash"),
    )
