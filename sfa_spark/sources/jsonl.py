"""JSONL corpus ingestion — the wire format LLM text pipelines
actually receive (one JSON document per line, often with a long tail
of malformed records).

Spark-native: ``spark.read.json`` with an EXPLICIT schema (never
inference — at 100 TB schema inference is a full extra pass over the
data) and PERMISSIVE mode, so malformed lines land in a
``_corrupt_record`` column instead of failing the job. The quarantine
split below turns that into the standard ingest contract: a clean
typed DataFrame plus a dead-letter frame to audit, in ONE scan.

The reference's loaders (SURVEY §2.1) parse fixed layouts and abort
on malformed rows; web-scale corpora cannot afford that — hence
first-class quarantine here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id bigint, text string, lang string"
_CR = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOC_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL directory/file into (clean, quarantine).

    clean: rows matching the schema, typed. quarantine: one string
    column ``raw`` per malformed line (bad JSON, or JSON whose types
    conflict with the schema). A row is quarantined — not silently
    null-padded — whenever Spark captured its raw text.
    """
    df = (
        spark.read.schema(f"{schema}, {_CR} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CR)
        .json(path)
        # Spark forbids querying ONLY the corrupt column off a raw
        # JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the engine's
        # own prescription is to cache the parsed frame. At 100 TB,
        # persist the parse to parquet once instead and split there.
        .cache()
    )
    clean = df.where(F.col(_CR).isNull()).drop(_CR)
    quarantine = df.where(F.col(_CR).isNotNull()).select(
        F.col(_CR).alias("raw")
    )
    return clean, quarantine


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write as JSONL (one doc per line). n_files repartitions first —
    at scale, target ~100-500 MB per output file."""
    w = df.repartition(n_files) if n_files else df
    w.write.mode("overwrite").json(path)
