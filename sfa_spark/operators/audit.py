"""Pipeline data-quality instrumentation via ``df.observe``.

A 100 TB job cannot afford a second scan just to know what it
processed. ``Observation`` attaches aggregate metrics (row counts,
null counts, ranges) to a frame that are computed AS A SIDE EFFECT of
whatever action runs anyway — the metrics ride the existing job's
partials to the driver, zero extra jobs, zero extra scans. The same
``observe`` call works on streaming queries (metrics arrive per
micro-batch in StreamingQueryProgress.observedMetrics), which is how
an ingest gate reports drop rates without a second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_metrics(cols: list[str]) -> list:
    """Standard health metrics: total rows + per-column null counts
    (schema-drift / upstream-corruption detectors)."""
    m = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        m.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    return m


def with_observation(df: DataFrame, name: str, cols: list[str]):
    """Attach quality metrics; returns (instrumented_df, observation).
    Run any action on the returned frame, then read
    ``observation.get`` — a dict of the metrics for exactly the rows
    that action consumed."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *quality_metrics(cols)), obs
