"""Index-path driver queries: the prefix-partitioned SFA index answers
k-NN over the embeddings table; the DuckDB oracle recomputes via a
brute-force linear scan — a cross-implementation check of the whole
two-phase (probe → box-prune → verify) plan.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from sfa_spark.plans.index import SFAIndex
from sfa_spark.queries import rnd
from sfa_spark.sources.events import load_table

IDX_K = 3
IDX_QUERIES = 10


def _vec_arrays(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("series_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("values"),
    )


def q_index_knn(spark, sf_dir):
    arrays = _vec_arrays(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="sfa_index_")
    idx = SFAIndex.build(arrays, path, word_length=8, alphabet=8, prefix_len=2)
    res = idx.knn(arrays.where(F.col("series_id") < IDX_QUERIES), k=IDX_K)
    return res.select("q_id", "nn_id", rnd("dist", 4).alias("dist"), "rk")
