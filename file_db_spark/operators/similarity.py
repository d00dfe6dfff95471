"""Similarity search over the `embeddings` table.

- v1 brute-force top-k: small query set broadcast against the corpus —
  the exact baseline. Scale: corpus-side stays partitioned; per-query
  top-k via window (or RDD treeAggregate for huge k... not needed).
- v2 LSH (random hyperplane) bucketed ANN: sign-bit bucket equi-join,
  probes only same-bucket candidates — the 100 TB path.
- v3 IVF-style: coarse cells (the `label` column stands in for a
  k-means assignment) — search only the query's cell.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.vectors import cosine, dot, unit_normalize

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 3


@_q(
    "v1_knn_bruteforce",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos_sim
      FROM q JOIN embeddings c ON c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
             ) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
)
def v1_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: queries (tiny) are broadcast, corpus
    stays partitioned; scoring is a map-only stage, then one shuffle on
    query_id for the per-query top-k window."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    cos = cosine(F.col("q_emb").cast("array<double>"), F.col("c_emb").cast("array<double>"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


@_q(
    "v3_ivf_topk",
    f"""
    WITH q AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos_sim
      FROM q JOIN embeddings c ON c.label = q.label AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
             ) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
)
def v3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse cell (label column
    as the cell assignment). At scale: corpus bucketed/partitioned by
    cell -> the probe is a partition-pruned scan, not a full pass."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
    )
    cos = cosine(F.col("q_emb").cast("array<double>"), F.col("c_emb").cast("array<double>"))
    scored = c.join(
        F.broadcast(q),
        (F.col("c_label") == F.col("q_label"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select("query_id", "neighbor_id", cos.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic random hyperplanes (seed fixed) for sign-LSH."""
    rng = np.random.default_rng(42)
    return rng.standard_normal((n_planes, dim)).tolist()


def _embedding_dim(sf_dir: str) -> int:
    """Embedding dimensionality from the parquet file — a one-batch
    footer/metadata probe via pyarrow (O(1) IO, no Spark job, nothing
    shipped through the driver's result path). The schema alone can't
    carry it because the column is list<float>, not fixed_size_list."""
    import os

    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    batch = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    return len(batch.column("embedding")[0])


def v2_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 8 sign bits -> 256 buckets; queries
    probe only their own bucket, then exact cosine re-rank inside it.
    Recall < 1 by design (approximate) -> rows-only check; determinism
    from the fixed hyperplane seed.

    Scale: bucket id is a derived column — repartition/bucket the
    corpus by it once, and every query touches 1/256 of the data.
    Corpus/query bucket columns carry distinct names (c_bucket /
    q_bucket) so the join condition is unambiguous.
    """
    e = load_table(spark, sf_dir, "embeddings")
    planes = _hyperplanes(8, _embedding_dim(sf_dir))

    def bucket_of(emb_col):
        bits = [
            F.when(
                dot(
                    emb_col.cast("array<double>"),
                    F.array(*[F.lit(float(v)) for v in plane]),
                )
                >= 0,
                1 << i,
            ).otherwise(0)
            for i, plane in enumerate(planes)
        ]
        out = F.lit(0)
        for b in bits:
            out = out + b
        return out

    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        bucket_of(F.col("embedding")).alias("c_bucket"),
    )
    q = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            bucket_of(F.col("embedding")).alias("q_bucket"),
        )
    )
    cos = cosine(F.col("q_emb").cast("array<double>"), F.col("c_emb").cast("array<double>"))
    scored = corpus.join(
        F.broadcast(q),
        (F.col("c_bucket") == F.col("q_bucket"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select("query_id", "neighbor_id", cos.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


QUERIES["v2_ann_lsh"] = v2_ann_lsh
