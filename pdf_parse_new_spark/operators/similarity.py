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


def embedding_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_tables: int = 4,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int = 200,
    observation=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, cosine >= threshold)
    via multi-table hyperplane LSH: each table buckets independently
    (recall ~= 1 - (1 - p^planes)^tables with p = 1 - theta/pi), candidate
    pairs expand in-bucket (no self-join, no cartesian), exact cosine runs
    only on deduplicated candidates. Approximate by design — recall is a
    tunable, unlike the exact-verified MinHash text path."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))

    # ONE vectorized UDF emits every table's bucket per row (posexplode
    # recovers (tbl, bucket)): the previous per-table union ran n_tables
    # separate scans + Python stages (~0.3 s fixed latency each). The
    # per-table matmuls are computed separately inside the UDF so each
    # bucket's float arithmetic is exactly the per-table UDF's.
    plane_list = [
        np.random.RandomState(SEED + 1 + t).standard_normal((dim, n_planes))
        for t in range(n_tables)
    ]
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("array<long>")
    def buckets_all(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        per_t = [
            ((mat @ planes) > 0).astype(np.int64) @ weights
            for planes in plane_list
        ]
        return pd.Series(list(np.stack(per_t, axis=1)), index=vecs.index)

    banded = base.select(
        "id", F.posexplode(buckets_all(F.col("v"))).alias("tbl", "bucket")
    )

    ids = F.array_sort(F.collect_list("id"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    # hot-bucket cap: same rationale as dedup.minhash_dedup_pairs (one
    # degenerate bucket = one reducer + O(n^2) pairs); drops are observable
    # via the optional Observation, never silent
    grouped = (
        banded.groupBy("tbl", "bucket")
        .agg(ids.alias("ids"))
        .withColumn("n", F.size("ids"))
    )
    if observation is not None:
        grouped = grouped.observe(
            observation,
            F.count_if(F.col("n") > max_bucket).alias("dropped_buckets"),
            F.max("n").alias("max_bucket_size"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    cand = (
        grouped.filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id1").alias("id1"), F.col("p.id2").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    # norms computed ONCE per id before the join (the exchange
    # materializes them): an id appears in ~bucket_size candidate pairs,
    # and cosine() re-ran the interpreted norm aggregate per PAIR. The
    # division uses the same per-id norm expressions, so sims are
    # bit-identical.
    vecs = base.select(F.col("id"), F.col("v"), _norm(F.col("v")).alias("nv"))
    sim_expr = _dot(F.col("v1"), F.col("v2")) / (F.col("nv1") * F.col("nv2"))
    return (
        cand.join(
            vecs.withColumnsRenamed({"id": "id1", "v": "v1", "nv": "nv1"}),
            "id1",
        )
        .join(
            vecs.withColumnsRenamed({"id": "id2", "v": "v2", "nv": "nv2"}),
            "id2",
        )
        .withColumn("sim", F.round(sim_expr, 6))
        .filter(F.col("sim") >= threshold)
        .select("id1", "id2", "sim")
    )


def _ivf_assign_udf(centroids: np.ndarray):
    """list_id = argmax cosine(vector, centroid) — one matmul per Arrow
    batch against the (n_lists, dim) centroid matrix."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
        return pd.Series(
            np.argmax(mat @ cn.T, axis=1).astype(np.int32), index=vecs.index
        )

    return assign


def train_ivf_centroids(
    df: DataFrame,
    dim: int,
    n_lists: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic spherical k-means for the IVF coarse quantizer.

    Init = the ``n_lists`` vectors with the smallest xxhash64(id) (a seeded
    pseudo-random but reproducible sample); each Lloyd iteration is ONE
    Spark job: vectorized assignment UDF -> groupBy list_id -> per-dimension
    ``avg`` (pure JVM agg; dim columns). Centroids live on the driver
    (n_lists x dim floats — tiny). At 100 TB: train on a sample (this
    function over df.sample(...)), assignment stays a single pass."""
    init = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_lists)
        .collect()
    )
    cents = np.array([list(r[0]) for r in init], dtype=np.float64)
    for _ in range(iters):
        assign = _ivf_assign_udf(cents)
        rows = (
            df.select(assign(F.col(vec_col)).alias("list_id"), vec_col)
            .groupBy("list_id")
            .agg(*[F.avg(F.col(vec_col)[i]).alias(f"c{i}") for i in range(dim)])
            .collect()
        )
        for r in rows:  # empty lists keep their previous centroid
            cents[r["list_id"]] = [r[f"c{i}"] for i in range(dim)]
    return cents


def ann_topk_ivf(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_lists: int = 16,
    n_probes: int = 4,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize vectors into ``n_lists``
    inverted lists (spherical k-means), then scan only the ``n_probes``
    lists whose centroids are most cosine-similar to the query — exact
    cosine within. Scans ~n_probes/n_lists of the data; unlike hyperplane
    LSH the partitioning ADAPTS to the data distribution, which is what
    lifts recall on clustered embeddings (the classic FAISS IVF-flat
    shape). At 100 TB ``list_id`` is the partition/cluster key, training
    runs on a sample, and the probe is a partition-pruned scan + local
    top-k."""
    dim = len(query)
    if centroids is None:
        centroids = train_ivf_centroids(df, dim, n_lists, iters, vec_col, id_col)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    q = np.asarray(query, dtype=np.float64)
    sims = cn @ (q / max(np.linalg.norm(q), 1e-12))
    probes = [int(i) for i in np.argsort(-sims)[:n_probes]]
    assigned = df.withColumn(
        "list_id", _ivf_assign_udf(centroids)(F.col(vec_col))
    )
    return cosine_topk(
        assigned.filter(F.col("list_id").isin(probes)), query, k, vec_col,
        id_col,
    )


def ann_topk_lsh(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probes: int | None = None,
) -> DataFrame:
    """Approximate top-k: MULTI-PROBE hyperplane LSH — scan the query's
    bucket plus its Hamming-1 neighbors (flip each plane bit once), exact
    cosine within. Single-probe recall measured 0.20 on the synthetic
    embeddings; probing the n_planes+1 nearest buckets lifts it several-fold
    for (1 + n_planes)/2^n_planes of the data scanned (Lv et al.,
    "Multi-Probe LSH", VLDB 2007). At scale the bucket column is a
    partition/cluster key, so this stays a partition-pruned scan + local
    top-k; ``n_probes`` caps the probed buckets (default: all Hamming-1)."""
    dim = len(query)
    planes = _planes(dim, n_planes)
    margins = np.asarray(query) @ planes
    qsig = int((margins > 0).astype(np.int64) @ (1 << np.arange(n_planes)))
    # probe order: flip the planes the query is CLOSEST to first (smallest
    # |margin| = most likely to have split true neighbors away); past all
    # Hamming-1 neighbors, continue with Hamming-2 pairs of the
    # smallest-margin planes ordered by summed margin (the perturbation-
    # set ordering of Lv et al. restricted to <=2 flips) — at n_planes=12
    # that reaches 28 of 4096 buckets (~0.7% of the data) for a measured
    # recall lift, still a partition-pruned scan at scale
    flip_order = np.argsort(np.abs(margins))
    if n_probes is None:
        n_probes = n_planes + 1
    seq: list[int] = [qsig]
    seq += [qsig ^ (1 << int(b)) for b in flip_order]
    m = np.abs(margins)
    pairs = sorted(
        (
            (m[i] + m[j], int(i), int(j))
            for ai, i in enumerate(flip_order[:8])
            for j in flip_order[ai + 1 : 8]
        ),
    )
    seq += [qsig ^ (1 << i) ^ (1 << int(j)) for _, i, j in pairs]
    probes = seq[: max(1, n_probes)]
    bucketed = lsh_buckets(df, dim, n_planes, vec_col)
    return cosine_topk(
        bucketed.filter(F.col("bucket").isin(probes)), query, k, vec_col, id_col
    )
