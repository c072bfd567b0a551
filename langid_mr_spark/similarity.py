"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the training-data-pipeline brief:

- ``cosine_topk``      — exact brute-force top-k (the baseline / verifier).
  All math in float64 with sequential summation so the DuckDB oracle
  (``list_dot_product(a::DOUBLE[], b::DOUBLE[])``) is bit-identical.
- ``lsh_bucket_topk``  — the scale path: random-hyperplane (sign-LSH)
  bucketing; candidates are generated bucket-locally (one shuffle on the
  bucket key) and only candidates are scored. Probing multiple hash tables
  trades recall for cost; exactness is NOT claimed — the verifier above is
  the ground truth (tests measure recall on fixtures).

Everything is native Spark SQL (zip_with/aggregate higher-order functions);
no UDF, so the scoring stays JVM-side and codegen-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-summation dot product (bit-identical to DuckDB
    list_dot_product on DOUBLE[])."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def cosine_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                qid_col: str = "qid", qvec_col: str = "qvec") -> DataFrame:
    """Exact top-k neighbors per query: broadcast the (small) query set
    against the vector table, rank per query. The big side is never
    shuffled — only the per-query top-k aggregation moves data."""
    joined = vectors.join(F.broadcast(queries)).select(
        F.col(qid_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(qvec_col)).alias("sim"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, F.round("sim", 6).alias("sim"))
    )


# --- sign-LSH bucketing (scale path) -----------------------------------------

def _hyperplanes(dim: int, planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed LCG → [-1, 1))."""
    out, x = [], 0x243F6A8885A308D3
    for _ in range(planes):
        row = []
        for _ in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((x / float(1 << 63)) * 2.0 - 1.0)
        out.append(row)
    return out


def lsh_signature(col: Column, dim: int, planes: int = 8) -> Column:
    """Sign-pattern bucket id: bit b = [v · hyperplane_b > 0]."""
    sig = F.lit(0)
    for b, plane in enumerate(_hyperplanes(dim, planes)):
        proj = F.aggregate(
            F.zip_with(
                _to_double(col),
                F.array(*[F.lit(p) for p in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def lsh_bucket_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                    dim: int = 32, planes: int = 6,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "qid", qvec_col: str = "qvec") -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's sign-LSH
    bucket. At 10^12 vectors this is the difference between scanning the
    world and scanning one bucket; recall is tested on fixtures against
    cosine_topk."""
    v = vectors.withColumn("_bucket", lsh_signature(F.col(vec_col), dim, planes))
    q = queries.withColumn("_bucket", lsh_signature(F.col(qvec_col), dim, planes))
    joined = v.join(F.broadcast(q), "_bucket").select(
        F.col(qid_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(qvec_col)).alias("sim"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, F.round("sim", 6).alias("sim"))
    )
