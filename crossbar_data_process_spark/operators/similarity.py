"""Similarity search over embedding columns (engine extension;
SURVEY.md §7.1 step 7): brute-force cosine top-k baseline plus an
LSH-bucketed approximate variant as the scale path.

Scale notes: brute-force is O(Q×N) — fine when the query set is small and
broadcast; the LSH variant buckets both sides by random-hyperplane sign
signatures so the join only compares within-bucket candidates (the standard
ANN trade: recall vs the number of hyperplanes/probes). Vector math is
``zip_with`` + ``aggregate`` fold — JVM-side, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.topk import top_k_per_group


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold dot product (deterministic summation order —
    matches the SQL oracle's list_reduce order exactly)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column, scale: int = 6) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), scale)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest corpus
    vectors (self-matches excluded). ``queries`` is broadcast — the corpus is
    scanned once, partition-parallel, no corpus shuffle; the only shuffle is
    the final per-query top-k window on ``|Q|`` keys.

    Deterministic: ties broken by ascending corpus id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cosine")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        k,
        rank_col="rnk",
    )


# fixed pseudo-random hyperplanes (deterministic: linear congruential series)
def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    planes = []
    state = 1234567
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_signature(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane signature: concat of sign bits of <v, plane_i>."""
    planes = _hyperplanes(dim, n_planes)
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(x) for x in p])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: compare only vectors in the same
    random-hyperplane bucket. Trades recall for a candidate set ~n/2^planes
    per bucket; at 100 TB this is the difference between a broadcast-scan and
    an infeasible cross product. Multi-probe (flip one bit) would raise
    recall; kept single-probe for clarity."""
    sig = lambda df, idn, vn: df.select(  # noqa: E731
        F.col(id_col).alias(idn),
        F.col(vec_col).alias(vn),
        lsh_bucket_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    c = sig(vectors, "neighbor_id", "cv")
    q = sig(queries, "query_id", "qv")
    scored = (
        c.join(
            F.broadcast(q.withColumnRenamed("bucket", "qbucket")),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cosine")
    )
    return top_k_per_group(
        scored, ["query_id"], [F.desc("cosine"), F.asc("neighbor_id")], k, rank_col="rnk"
    )
