"""Similarity search over the embeddings table (array<float> column).

Two tiers:

- brute_force_topk: exact cosine top-k. The corpus-side scan is linear and
  the small query set is broadcast, so the plan is a broadcast
  nested-loop + per-query TakeOrdered — correct at any scale but O(Q·N);
  it is the baseline/verifier.
- lsh_bucketed_topk: sign-LSH (random-hyperplane) bucketing. Hyperplanes
  are ±1 vectors derived deterministically from md5 at module import and
  inlined as literals in BOTH engines, so the oracle reproduces them. The
  candidate search is an EQUI-join on the bucket key — the shape that
  scales to 100 TB (shuffle by bucket, no cross join). Recall < 1 by
  construction; the brute-force tier is the ground truth to measure it.

All vector math is done in double after an explicit float→double cast, with
a left-fold accumulation order mirrored by DuckDB's list_dot_product —
verified bit-identical (see tools/check_oracle.py runs).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table

N_PLANES = 6  # 2^6 = 64 buckets


def _plane_sign(j: int, i: int) -> int:
    return 1 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:2], 16) % 2 == 0 else -1


PLANES: list[list[int]] = [[_plane_sign(j, i) for i in range(64)] for j in range(N_PLANES)]


def _dot(a: str, b: str) -> Column:
    """Sequential left-fold dot product (matches list_dot_product order)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"
    )


def with_norm(embeddings: DataFrame) -> DataFrame:
    """Add emb (double[]) and norm columns."""
    e = embeddings.withColumn("emb", F.expr("transform(embedding, x -> cast(x as double))"))
    return e.withColumn("norm", F.sqrt(_dot("emb", "emb")))


def cosine_expr(a_alias: str, b_alias: str) -> Column:
    dot = _dot(f"{a_alias}.emb", f"{b_alias}.emb")
    return dot / (F.col(f"{a_alias}.norm") * F.col(f"{b_alias}.norm"))


def brute_force_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 10, k: int = 10
) -> DataFrame:
    """Exact cosine top-k for the first `n_queries` vectors (self excluded).
    Query side broadcast; ties broken by neighbor id."""
    corpus = with_norm(load_table(spark, sf_dir, "embeddings")).select("vec_id", "emb", "norm")
    queries = corpus.filter(F.col("vec_id") < n_queries)
    q = F.broadcast(queries).alias("q")
    c = corpus.alias("c")
    scored = (
        c.join(q, F.col("c.vec_id") != F.col("q.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cosine_expr("q", "c").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def _bucket_col() -> Column:
    """Sign-LSH bucket: one bit per hyperplane, concatenated to a string key."""
    bits = []
    for plane in PLANES:
        arr = "array(" + ",".join(f"cast({s} as double)" for s in plane) + ")"
        proj = F.expr(
            f"aggregate(zip_with(emb, {arr}, (x, s) -> x * s), cast(0.0 as double), (acc, v) -> acc + v)"
        )
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucketed_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """ANN: candidates = corpus vectors in the query's LSH bucket (equi-join
    on the bucket key — the scan/shuffle shape that survives 100 TB), then
    exact cosine re-rank within the bucket."""
    corpus = with_norm(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "emb", "norm", _bucket_col().alias("bucket")
    )
    queries = corpus.filter(F.col("vec_id") < n_queries)
    q = F.broadcast(queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        "bucket",
    ))
    cand = corpus.join(q, on="bucket", how="inner").filter(
        F.col("vec_id") != F.col("query_id")
    )
    dot = _dot("q_emb", "emb")
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot / (F.col("q_norm") * F.col("norm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def lsh_plane_sql(plane: list[int]) -> str:
    """The same hyperplane as a DuckDB DOUBLE[] literal (for oracle SQL)."""
    return "[" + ",".join(str(s) for s in plane) + "]::DOUBLE[]"
