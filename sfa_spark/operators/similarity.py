"""Similarity search over embedding columns (BASELINE.json north star).

  * brute-force cosine top-k — the correctness baseline. The dot
    product is a JVM-side zip_with/aggregate fold (deterministic
    left-to-right summation — reproducible across runs AND mirrorable
    in an oracle), no Python.
  * sign-bucket IVF — the scale path: a cheap coarse quantizer (sign
    bits of the first b dims) buckets vectors; queries probe only their
    bucket. Same two-phase signature→partition→verify shape as the SFA
    trie index and MinHash LSH. Recall/probe-count trade documented at
    the call site; exact re-rank inside the bucket.

At 100 TB: broadcast the (small) query set, scan the corpus once,
per-query top-k via aggregation — no shuffle of the corpus. The bucket
variant prunes the scan with partition pruning when the corpus is
written partitionBy(bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the L2 norm (JVM fold, deterministic order)."""
    v = _as_double(F.col(vec_col))
    return emb.withColumn(
        "norm",
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)),
    )


def dot_expr(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (q_id, nn_id, cosine, rk). Skips self-matches. The query
    side is broadcast — the corpus is scanned exactly once."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("q_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.col("norm").alias("qn"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("nn_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        F.col("norm").alias("cn"),
    )
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("q_id") != F.col("nn_id"))
    scored = pairs.select(
        "q_id",
        "nn_id",
        (dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("nn_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
    )


def sign_bucket(col, n_bits: int = 6):
    """Coarse quantizer: bucket = Σ (v[i] > 0) << i over the first
    n_bits dims. Cheap, deterministic, SQL-portable. n_bits is a static
    plan constant, so the sum unrolls into codegen'd expressions."""
    b = F.lit(0).cast("bigint")
    for j in range(n_bits):
        b = b + F.when(F.element_at(col, j + 1) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        ).cast("bigint")
    return b


def cosine_topk_bucketed(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_bits: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe only the query's sign bucket, exact
    cosine re-rank inside. Output: (q_id, nn_id, bucket, cosine, rk)."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("q_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.col("norm").alias("qn"),
        sign_bucket(_as_double(F.col(vec_col)), n_bits).alias("bucket"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("nn_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        F.col("norm").alias("cn"),
        sign_bucket(_as_double(F.col(vec_col)), n_bits).alias("bucket"),
    )
    pairs = c.join(F.broadcast(q), "bucket").where(F.col("q_id") != F.col("nn_id"))
    scored = pairs.select(
        "q_id",
        "nn_id",
        "bucket",
        (dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("nn_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
    )
