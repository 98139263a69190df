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


def scalar_quantize(
    emb: DataFrame,
    alphabet: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """SQ compression — the SFA idea applied to embeddings (SURVEY §7:
    'SFA words over embedding coordinates generalize to vector
    quantization'): per DIMENSION, equi-width bins over the corpus;
    each float becomes a small int symbol (alphabet≤256 → int8-sized).

    Returns (codes, stats):
      codes = (vec_id, codes array<int>) — 4-8× smaller than float32;
      stats = (dim, vmin, vmax) — the tiny codebook.
    Distances on reconstructed values (bin centers) approximate true
    distances; exact re-rank on the float column is the verify phase.
    """
    dims = emb.select(
        F.posexplode(_as_double(F.col(vec_col))).alias("dim", "v"),
        F.col(id_col).alias("vid"),
    )
    stats = dims.groupBy("dim").agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax")
    )
    rng = F.col("vmax") - F.col("vmin")
    sym = F.when(rng < 1e-12, F.lit(0)).otherwise(
        F.least(
            F.lit(alphabet - 1),
            F.greatest(
                F.lit(0), F.floor((F.col("v") - F.col("vmin")) * alphabet / rng).cast("int")
            ),
        )
    )
    coded = (
        dims.join(F.broadcast(stats), "dim")
        .select("vid", "dim", sym.cast("int").alias("sym"))
        .groupBy("vid")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "sym"))),
                lambda s: s["sym"],
            ).alias("codes")
        )
        .select(F.col("vid").alias(id_col), "codes")
    )
    return coded, stats


def sq_reconstructed_topk(
    codes: DataFrame,
    stats: DataFrame,
    k: int,
    alphabet: int = 16,
    n_queries: int = 10,
) -> DataFrame:
    """Approximate top-k by squared ED between RECONSTRUCTED vectors
    (bin centers): recon = vmin + (sym + 0.5)·step. All arithmetic on
    the compressed codes — the float column is never read."""
    centers = stats.select(
        "dim",
        "vmin",
        F.when(F.col("vmax") - F.col("vmin") < 1e-12, F.lit(0.0))
        .otherwise((F.col("vmax") - F.col("vmin")) / alphabet)
        .alias("step"),
    )
    long = codes.select(
        "vec_id", F.posexplode("codes").alias("dim", "sym")
    ).join(F.broadcast(centers), "dim").select(
        "vec_id",
        "dim",
        (F.col("vmin") + (F.col("sym") + 0.5) * F.col("step")).alias("r"),
    )
    q = long.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), "dim", F.col("r").alias("qr")
    )
    c = long.select(F.col("vec_id").alias("nn_id"), "dim", F.col("r").alias("cr"))
    d = (
        q.join(c, "dim")
        .where(F.col("q_id") != F.col("nn_id"))
        .groupBy("q_id", "nn_id")
        .agg(F.sum((F.col("qr") - F.col("cr")) ** 2).alias("sqdist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sqdist").asc(), F.col("nn_id").asc())
    return d.withColumn("rk", F.row_number().over(w).cast("int")).where(
        F.col("rk") <= k
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
