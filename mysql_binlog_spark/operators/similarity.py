"""Similarity search over embedding columns (array<float>).

* ``cosine_knn`` — brute-force top-k: cross join queries × corpus with the
  dot product as JVM builtins (zip_with + aggregate, whole-stage codegen).
  The baseline; exact.  At scale: broadcast the (small) query set so the
  corpus scan stays shuffle-free, then a top-k per query via window.
* ``lsh_ann_*`` — sign-LSH (random hyperplanes): bucket by the sign
  pattern of dot(h_j, emb); candidates only within equal buckets.  The
  scale path — the corpus shuffles once on a uniform bucket key, no n².
* ``cosine_neardup_pairs`` — near-dup pairs above a cosine threshold via
  the same LSH bucketing.

Hyperplanes are deterministic md5-derived ±1 vectors
(functions/hashing.hyperplanes) shared with the DuckDB oracle as literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hyperplanes


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self).

    ``queries`` is broadcast — the corpus-side scan never shuffles; the
    only wide exchange is the per-query top-k reduce.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), round_digits).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_bucket_expr(vec_col, planes: list[list[float]]):
    """Sign pattern of the hyperplane dots, packed into one bigint bucket."""
    bucket = F.lit(0).cast("bigint")
    for j, hp in enumerate(planes):
        dot_j = _dot(vec_col, F.array(*[F.lit(v) for v in hp]))
        bucket = bucket + F.when(dot_j >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_ann_buckets(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    planes = hyperplanes(n_planes, dim)
    return df.select(
        F.col(id_col),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """Near-duplicate vector pairs: LSH-bucketed candidates (few planes →
    high recall), exact cosine verify above ``threshold``."""
    planes = hyperplanes(n_planes, dim)
    withb = df.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    a = withb.alias("a")
    b = withb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round(
                cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")),
                round_digits,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
