"""Byte-pair-encoding tokenizer: distributed word counting + bounded
merge fit + row-local distributed encode.

The token-count estimator (text.token_estimate) approximates a BPE
tokenizer's budget; this module is the real thing (Sennrich et al.
2016, ACL): learn the merge table from corpus statistics, then encode
any document with it.

Architecture, 100 TB-first:

  * ``word_counts`` — the only corpus-sized pass: a whitespace
    tokenize + groupBy(word) count, map-side combinable. Its OUTPUT
    is the distinct-word dictionary (~10⁷ rows for web-scale English
    — Heaps' law, not corpus-sized).
  * ``bpe_fit`` — the merge loop runs over that dictionary on the
    driver (gated by ``max_vocab``; every published BPE trainer is
    dictionary-local for the same reason: each merge mutates global
    state). Deterministic: ties break by (count desc, pair asc).
  * ``bpe_encode`` — the hot path at scale and fully row-local: the
    merge table broadcasts as a rank dict inside a mapInPandas batch
    fn, with per-batch word memoization (Zipf: a batch's distinct
    words ≪ its tokens). No shuffle, no state; linear in corpus size.

The fit is an iterative global argmax (same class as APCA's greedy
merge) — but it IS exactly SQL-replayable: the q_bpe_tokens oracle
(oracles_text.py) re-runs the whole trainer as a DuckDB recursive CTE
(per-iteration GROUP BY for the best pair + greedy list_reduce merge
application) and hash-matches the distributed encode. Correctness is
additionally pinned by the published worked example
(low/lower/newest/widest), an independent pure-python
re-implementation cross-check on random text, and
roundtrip/monotonicity properties (tests/test_llm_ops.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — lowercased whitespace words, the
    same normalization as text.with_tokens."""
    from sfa_spark.operators.text import with_tokens

    return (
        with_tokens(docs.select(F.col(text_col).alias("text")))
        .select(F.explode("toks").alias("word"))
        .where(F.length("word") > 0)  # empty docs tokenize to [""]
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _fit_merges(
    vocab: dict[str, int], n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word→count dict. Deterministic:
    best pair = max count, ties by lexicographically smallest pair."""
    seqs: list[tuple[list[str], int]] = [
        (list(w[:-1]) + [w[-1] + END], c) for w, c in sorted(vocab.items())
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, c in seqs:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        a, b = best[0]
        merged = a + b
        nxt = []
        for sym, c in seqs:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt.append((out, c))
        seqs = nxt
        merges.append((a, b))
    return merges


def bpe_fit(
    docs: DataFrame,
    n_merges: int = 200,
    min_freq: int = 2,
    text_col: str = "text",
    max_vocab: int = 2_000_000,
    min_count: int = 1,
) -> DataFrame:
    """Learn the merge table. Returns (rank int, left string,
    right string) with rank = merge order, a broadcast-sized artifact
    (n_merges rows).

    The driver holds the distinct-word dictionary (≤ max_vocab
    entries, ~40 B each → ≤ ~100 MB at the default gate); above the
    gate, raise it knowingly or set min_count ≥ 2 — the standard
    trainer move (SentencePiece/HF default to frequency cutoffs):
    hapax words are ~half of a web-scale dictionary under Zipf, and
    the cutoff applies DISTRIBUTEDLY before the collect. The merge
    loop itself is inherently global-state-per-iteration, so there is
    no shuffle-parallel form that preserves exact semantics.
    """
    wc = word_counts(docs, text_col=text_col)
    if min_count > 1:
        wc = wc.where(F.col("cnt") >= min_count)
    rows = wc.limit(max_vocab + 1).collect()
    assert len(rows) <= max_vocab, (
        f"bpe_fit: distinct words exceed max_vocab={max_vocab}; "
        f"raise the gate (driver dict memory) or pre-filter the corpus"
    )
    vocab = {r["word"]: int(r["cnt"]) for r in rows}
    merges = _fit_merges(vocab, n_merges, min_freq)
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word[:-1]) + [word[-1] + END] if word else []
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token stats: (doc_id, n_words, n_bpe_tokens,
    bpe_per_word). Row-local mapInPandas; the merge table rides the
    closure as a rank dict (n_merges entries). Lowest-rank-first
    pair application per word — the standard BPE encode order, which
    reproduces the fit's final segmentation exactly."""
    import re

    rank_rows = merges.collect()
    ranks = {(r["left"], r["right"]): int(r["rank"]) for r in rank_rows}
    # Java \s = [ \t\n\x0B\f\r] ONLY — Python str.split() also splits
    # on unicode whitespace (U+00A0 etc.), which would desynchronize
    # encode from the fit dictionary built by the JVM-side tokenizer
    java_ws = re.compile(r"[ \t\n\x0B\f\r]+")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batches:
            out_words, out_toks = [], []
            for text in pdf["text"]:
                words = (
                    [w for w in java_ws.split(str(text).lower()) if w]
                    if text is not None
                    else []
                )
                total = 0
                for w in words:
                    n = memo.get(w)
                    if n is None:
                        n = len(_encode_word(w, ranks))
                        memo[w] = n
                    total += n
                out_words.append(len(words))
                out_toks.append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": pd.Series(out_words, dtype="int64"),
                    "n_bpe_tokens": pd.Series(out_toks, dtype="int64"),
                }
            )

    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    enc = base.mapInPandas(
        fn, "doc_id bigint, n_words bigint, n_bpe_tokens bigint"
    )
    return enc.withColumn(
        "bpe_per_word",
        F.when(
            F.col("n_words") > 0, F.col("n_bpe_tokens") / F.col("n_words")
        ).otherwise(F.lit(0.0)),
    )
