"""Similarity search over embedding columns (array<float>).

* ``cosine_neardup_pairs`` — exact cosine near-duplicate pairs. The dot
  product is a strict left-to-right fold (``F.aggregate`` over
  ``F.zip_with``) so the IEEE result is reproducible and matches the DuckDB
  oracle's ordered ``list_sum``; output carries ids only (floats stay out of
  hashed results).
* ``ann_topk_bruteforce`` — baseline exact top-k neighbors per query id.
* ``ann_topk_lsh`` — the scale path: random-hyperplane LSH (deterministic,
  hash-derived pseudo-planes — no RNG), bucket join, within-bucket brute
  force. At 100 TB the bucket join replaces the full cross product; recall
  is tested against the brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_col(e: str = "embedding"):
    return F.sqrt(
        F.aggregate(
            F.col(e),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_neardup_pairs(embs: DataFrame, threshold: float = 0.999) -> DataFrame:
    n = embs.select("vec_id", "embedding", _norm_col().alias("nrm"))
    a = n.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"),
                 F.col("nrm").alias("n_a"))
    b = n.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"),
                 F.col("nrm").alias("n_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("e_a"), F.col("e_b")) / (F.col("n_a") * F.col("n_b"))
    return pairs.withColumn("cos", cos).filter(F.col("cos") >= threshold).select(
        "id_a", "id_b"
    )


def ann_topk_bruteforce(embs: DataFrame, k: int = 5,
                        queries: DataFrame | None = None) -> DataFrame:
    """Exact top-k cosine neighbors. ``queries`` defaults to the corpus
    itself (self-join, excluding identity)."""
    n = embs.select("vec_id", "embedding", _norm_col().alias("nrm"))
    q = (queries or embs).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_e")
    ).withColumn("q_n", _norm_col("q_e"))
    pairs = q.join(n, F.col("q_id") != F.col("vec_id"))
    cos = _dot(F.col("q_e"), F.col("embedding")) / (F.col("q_n") * F.col("nrm"))
    scored = pairs.select("q_id", "vec_id", cos.alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )


def _lsh_bucket(e: str, n_planes: int, dim: int):
    """Deterministic random-hyperplane signature: plane p component j =
    ±1 from xxhash64(p, j) parity. sign_p = sum_j e[j] * s_pj > 0."""
    bits = None
    for p in range(n_planes):
        comp = F.aggregate(
            F.zip_with(
                F.col(e),
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, j: x.cast("double")
                * F.when(F.pmod(F.xxhash64(F.lit(p), j), 2) == 0, 1.0).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(comp > 0, F.lit(1 << p)).otherwise(0)
        bits = bit if bits is None else bits + bit
    return bits


def ann_topk_lsh(embs: DataFrame, k: int = 5, n_planes: int = 8,
                 dim: int = 64) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share a hyperplane-sign
    bucket; brute force within bucket only."""
    n = embs.select("vec_id", "embedding", _norm_col().alias("nrm")).withColumn(
        "bucket", _lsh_bucket("embedding", n_planes, dim)
    )
    a = n.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_e"),
                 F.col("nrm").alias("q_n"), "bucket")
    b = n.select("vec_id", "embedding", "nrm", F.col("bucket").alias("bucket_b"))
    pairs = a.join(b, (F.col("bucket") == F.col("bucket_b"))
                   & (F.col("q_id") != F.col("vec_id")))
    cos = _dot(F.col("q_e"), F.col("embedding")) / (F.col("q_n") * F.col("nrm"))
    scored = pairs.select("q_id", "vec_id", cos.alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )
