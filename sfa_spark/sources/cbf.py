"""Cylinder-Bell-Funnel synthetic dataset (Saito 1994) — the standard
3-class benchmark the reference's golden tests use (CBF). Seeded and
deterministic; used for accuracy goldens in tests/.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def cbf_numpy(n_per_class: int, length: int = 128, seed: int = 0):
    rng = np.random.default_rng(seed)
    X, y = [], []
    for cls in range(3):
        for _ in range(n_per_class):
            a = rng.integers(16, 32)
            b = a + rng.integers(32, 96 - 16)
            b = min(b, length - 8)
            eta = rng.normal(0, 1)
            eps = rng.normal(0, 1, length)
            t = np.arange(length)
            mask = ((t >= a) & (t <= b)).astype(float)
            if cls == 0:  # cylinder
                s = (6 + eta) * mask
            elif cls == 1:  # bell
                s = (6 + eta) * mask * (t - a) / max(b - a, 1)
            else:  # funnel
                s = (6 + eta) * mask * (b - t) / max(b - a, 1)
            X.append(s + eps)
            y.append(float(cls))
    return np.array(X), np.array(y)


def cbf_dataset(
    spark: SparkSession, n_per_class: int, length: int = 128, seed: int = 0,
    znorm: bool = True, id_offset: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Returns (arrays, labels): array-form series + (series_id, label)."""
    X, y = cbf_numpy(n_per_class, length, seed)
    if znorm:
        X = (X - X.mean(axis=1, keepdims=True)) / X.std(axis=1, keepdims=True)
    arrays = spark.createDataFrame(
        [(i + id_offset, row.tolist()) for i, row in enumerate(X)],
        "series_id long, values array<double>",
    )
    labels = spark.createDataFrame(
        [(i + id_offset, float(lab)) for i, lab in enumerate(y)],
        "series_id long, label double",
    )
    return arrays, labels
