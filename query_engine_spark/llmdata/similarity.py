"""Similarity search over an embedding column (array<float>).

- `cosine_topk`: exact brute-force top-k — the correctness baseline. The
  query side is broadcast (queries are few), so the big side streams through
  a map-only stage computing dot products in codegen'd array expressions
  (F.zip_with/F.aggregate → no Python), then a per-query top-k
  (window row_number ≤ k: partial top-k per partition, no global sort).
- `ivf_topk`: the scale path — assign every vector to its nearest centroid
  (map-only vs broadcast centroids), then search only the query's `nprobe`
  nearest cells. At 100 TB the assignment is written once, partitioned by
  cell id, and each query prunes to nprobe partitions.

All arithmetic is cast to double before accumulating so results are portable
across engines (float32 inputs, float64 math — what the DuckDB oracle does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["dot", "l2_norm", "cosine", "cosine_topk", "assign_cells", "ivf_topk"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, sim, rank).

    `sim` is rounded to 6 decimals BEFORE ranking so rank order is stable
    under float summation-order differences; ties break by vec_id.
    """
    q = F.broadcast(queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")))
    pairs = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")).crossJoin(q)
    if not include_self:
        pairs = pairs.filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    # long rank: DuckDB's row_number() is BIGINT — keep oracle schemas aligned
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(F.col("rank") <= k)


def assign_cells(
    embeddings: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id_col: str = "cent_id",
    cent_vec_col: str = "cent_vec",
) -> DataFrame:
    """IVF assignment: nearest centroid per vector (by cosine; ties → lowest
    centroid id). Map-only against broadcast centroids."""
    c = F.broadcast(centroids.select(F.col(cent_id_col).alias("cent_id"), F.col(cent_vec_col).alias("cv")))
    scored = (
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
        .crossJoin(c)
        .select("vec_id", "v", "cent_id", F.round(cosine(F.col("v"), F.col("cv")), 6).alias("csim"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cent_id"))
    return scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn", "csim")


def ivf_topk(
    embeddings: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: search only the `nprobe` cells nearest each query.

    Recall < 1 by construction; the bench compares it against `cosine_topk`.
    """
    assigned = assign_cells(embeddings, centroids, id_col=id_col, vec_col=vec_col)
    c = F.broadcast(centroids.select(F.col("cent_id").alias("qcent_id"), F.col("cent_vec").alias("cv")))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv"))
    q_cells = (
        q.crossJoin(c)
        .select("query_id", "qv", "qcent_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("csim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("qcent_id"))
    probes = q_cells.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= nprobe).drop("__rn", "csim")
    cand = probes.join(assigned, probes["qcent_id"] == assigned["cent_id"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w2).cast("long")).filter(F.col("rank") <= k)
