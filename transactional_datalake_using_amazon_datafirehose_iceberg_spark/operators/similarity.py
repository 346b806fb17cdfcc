"""Similarity search over embedding columns (NORTH-STAR tier).

Brute-force top-k cosine is the exact baseline: the (small) query set is
broadcast against the corpus, the dot product is a JVM-side
zip_with/aggregate fold (no Python, no shuffle of the corpus), and the
top-k is a per-query window. Cost O(|corpus| * |queries| * dim) — at
100 TB this is the *verification* path.

The scale path is LSH bucketing (``lsh_bucket_topk``): an 8-bit
sign-of-leading-dims bucket restricts candidates to the query's bucket
(~1/256 of the corpus for centered data) — the same
partition-pruning idea an IVF index applies, expressed as an equi-join
so Spark shuffles by bucket instead of replicating the corpus.

Determinism for the oracle: similarities are ranked on ROUND(cos, 6)
with vec_id tiebreak, so float noise below 1e-6 cannot reorder results
across engines (all arithmetic is double on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("__norm", _norm(F.col(vec_col)))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded)."""
    base = with_norm(emb, vec_col)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("__qe"),
        F.col("__norm").alias("__qnorm"),
    )
    sims = (
        base.join(F.broadcast(q), F.col(id_col) != F.col("qid"))
        .withColumn(
            "sim",
            F.round(
                _dot(F.col("__qe"), F.col(vec_col)) / (F.col("__qnorm") * F.col("__norm")),
                6,
            ).cast("double"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", F.col(id_col).alias("vec_id_n"), "sim", F.col("rn").cast("bigint").alias("rn"))
        .orderBy("qid", "rn")
    )


def sign_bucket(vec_col, n_bits: int = 8):
    """LSH bucket: sign bits of the first n_bits components."""
    bits = [
        F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)


def lsh_bucket_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket, joined by bucket equality (shuffle-by-bucket, no broadcast of
    the corpus needed at scale)."""
    base = with_norm(emb, vec_col).withColumn("__bucket", sign_bucket(vec_col, n_bits))
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("__qe"),
        F.col("__norm").alias("__qnorm"),
        F.col("__bucket").alias("__qbucket"),
    )
    sims = (
        base.join(
            F.broadcast(q),
            (F.col("__bucket") == F.col("__qbucket")) & (F.col(id_col) != F.col("qid")),
        )
        .withColumn(
            "sim",
            F.round(
                _dot(F.col("__qe"), F.col(vec_col)) / (F.col("__qnorm") * F.col("__norm")),
                6,
            ).cast("double"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            F.col(id_col).alias("vec_id_n"),
            "sim",
            F.col("rn").cast("bigint").alias("rn"),
            F.col("__bucket").alias("bucket"),
        )
        .orderBy("qid", "rn")
    )
