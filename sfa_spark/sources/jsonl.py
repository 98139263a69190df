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
    null-padded — whenever the parser captured its raw text.

    Implementation: a TEXT scan + ``from_json`` with a corrupt-record
    field, not ``spark.read.json``. Same parser, same PERMISSIVE
    semantics, but it sidesteps the engine's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction — whose documented
    workaround is caching the parsed frame, a storage-memory leak for
    a library function. Blank lines are skipped, as the JSON source
    does.
    """
    lines = spark.read.text(path).where(
        F.length(F.trim(F.col("value"))) > 0
    )
    parsed = lines.select(
        F.col("value"),
        F.from_json(
            F.col("value"),
            f"{schema}, {_CR} string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CR},
        ).alias("j"),
    )
    field_names = [f.strip().split()[0] for f in schema.split(",")]
    clean = parsed.where(
        F.col("j").isNotNull() & F.col(f"j.{_CR}").isNull()
    ).select(*[F.col(f"j.{n}").alias(n) for n in field_names])
    quarantine = parsed.where(
        F.col("j").isNull() | F.col(f"j.{_CR}").isNotNull()
    ).select(F.col("value").alias("raw"))
    return clean, quarantine


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write as JSONL (one doc per line). n_files repartitions first —
    at scale, target ~100-500 MB per output file."""
    w = df.repartition(n_files) if n_files else df
    w.write.mode("overwrite").json(path)
