"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k against a literal query vector —
  the correctness baseline. Dot product is a JVM ``aggregate(zip_with(...))``
  expression (whole-stage codegen; one scan, no Python, no shuffle except the
  final top-k, which Spark runs as TakeOrdered — partial per-partition heaps).
- ``lsh_buckets`` / ``ann_topk_lsh``: the scale path — random-hyperplane LSH
  signatures (sign bits of dot with h fixed seeded planes, computed by a
  vectorized Arrow pandas UDF as one numpy matmul per batch), bucket-pruned
  search: only rows in the query's bucket pay the exact distance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEED = 42


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def _planes(dim: int, n_planes: int) -> np.ndarray:
    return np.random.RandomState(SEED).standard_normal((dim, n_planes))


def lsh_bucket_udf(dim: int, n_planes: int = 12):
    planes = _planes(dim, n_planes)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("long")
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())          # (batch, dim) — one matmul
        signs = (mat @ planes) > 0                # (batch, n_planes)
        return pd.Series(signs.astype(np.int64) @ weights, index=vecs.index)

    return bucket


def lsh_buckets(df: DataFrame, dim: int, n_planes: int = 12,
                vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("bucket", lsh_bucket_udf(dim, n_planes)(F.col(vec_col)))


def ann_topk_lsh(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: prune to the query's LSH bucket, exact cosine
    within. At scale the bucket column is a partition/cluster key, so this
    becomes partition-pruned scan + local top-k."""
    dim = len(query)
    planes = _planes(dim, n_planes)
    qsig = int(
        ((np.asarray(query) @ planes) > 0).astype(np.int64)
        @ (1 << np.arange(n_planes)).astype(np.int64)
    )
    bucketed = lsh_buckets(df, dim, n_planes, vec_col)
    return cosine_topk(
        bucketed.filter(F.col("bucket") == qsig), query, k, vec_col, id_col
    )
