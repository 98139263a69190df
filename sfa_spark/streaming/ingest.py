"""Streaming corpus ingest — the arrival-time half of the LLM-data
pipeline (dedup / quality / language routing as documents land).

The batch operators in operators/text.py and operators/dedup.py are
row-local expressions or keyed aggregates, so the ingest chain maps
onto Structured Streaming directly:

  * quality gate / lang tag — stateless projections: run in-stream
    unchanged, no state store, no trigger constraints.
  * exact dedup — streaming `dropDuplicates` on the content hash:
    first-seen doc per hash is emitted, later copies are suppressed.
    State is one (hash) per distinct document — the price of
    whole-corpus dedup; with an event-time column, switch to
    `dropDuplicatesWithinWatermark` to bound state to the dedup
    horizon (documented, not defaulted: the testdata documents table
    has no timestamp).

At 100 TB ingest the chain is shuffle-free except the dedup state
exchange (hashpartitioning on content_hash — the same single shuffle
the batch hash-groupBy pays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sfa_spark.operators import text


def docs_stream(spark, path: str, schema=None) -> DataFrame:
    """File-source stream over a documents parquet directory (streams
    must declare a schema — inferred from a static metadata read)."""
    schema = schema or spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def stream_quality_gate(
    doc_stream: DataFrame, min_quality: float = 0.5
) -> DataFrame:
    """Keep documents whose heuristic quality clears the bar; emits the
    document plus (n_tokens, quality). Stateless — valid in append mode
    with any trigger."""
    stats = text.token_stats(doc_stream, keep=("text", "lang"))
    scored = text.quality_score(stats)
    return scored.where(F.col("quality") >= F.lit(min_quality)).select(
        "doc_id", "lang", "n_tokens", "quality"
    )


def stream_dedup_exact(doc_stream: DataFrame) -> DataFrame:
    """First-seen document per exact content hash (sha2-256 of text).
    Streaming dropDuplicates: one state row per distinct hash."""
    hashed = doc_stream.withColumn("content_hash", F.sha2(F.col("text"), 256))
    return hashed.dropDuplicates(["content_hash"])


def stream_ingest(doc_stream: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """The standard ingest chain: exact-dedup → quality gate. Output:
    (doc_id, lang, n_tokens, quality) of first-seen, above-bar docs."""
    return stream_quality_gate(stream_dedup_exact(doc_stream), min_quality)
