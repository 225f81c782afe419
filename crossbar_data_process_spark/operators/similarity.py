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
    """NULL (not an error) when either vector has zero norm: the session
    runs ANSI mode, where a plain ``/`` on a 0 divisor is DIVIDE_BY_ZERO
    and aborts the job — in a streaming dedup sink, a wedged stream
    (r10 review). ``try_divide`` keeps one evaluation of the norms and
    identical values whenever the divisor is nonzero, so every oracle
    hash is unchanged; downstream threshold filters drop the NULLs
    (zero vectors have no direction)."""
    return F.round(F.try_divide(dot(a, b), norm(a) * norm(b)), scale)


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


def lsh_bucket_signature(
    vec: Column, dim: int, n_planes: int = 8, plane_offset: int = 0
) -> Column:
    """Random-hyperplane signature: concat of sign bits of <v, plane_i>.
    ``plane_offset`` selects a disjoint plane slice from the deterministic
    series — table t of a multi-table scheme uses offset t*n_planes, so
    tables are independent but reproducible (and SQL-oracle-able)."""
    planes = _hyperplanes(dim, plane_offset + n_planes)[plane_offset:]
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(x) for x in p])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def _probe_signatures(bucket: Column, n_planes: int) -> Column:
    """Multi-probe set: the signature itself plus every 1-bit flip (the
    standard Hamming-1 probe sequence). A vector near a hyperplane falls on
    either side by chance; probing adjacent buckets recovers those misses
    for n_planes extra lookups instead of doubling the table."""
    flips = [
        F.concat(
            F.substring(bucket, 1, j),
            F.when(F.substring(bucket, j + 1, 1) == "1", F.lit("0")).otherwise(
                F.lit("1")
            ),
            F.substring(bucket, j + 2, n_planes - j - 1),
        )
        for j in range(n_planes)
    ]
    return F.array(bucket, *flips)


def _table_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int,
    tables: int,
    id_col: str,
    vec_col: str,
    multiprobe: bool = False,
) -> DataFrame:
    """(id, table, key) bucket assignments for a multi-table LSH scheme:
    table t signs the vector against its own disjoint slice of the
    deterministic hyperplane series. Recall of the OR-construction is
    1-(1-p^m)^L for per-plane agreement p — tuning (m=n_planes, L=tables)
    sets the operating point; a single AND-only table (L=1) cannot reach
    high recall for moderate-similarity neighbors (p^m collapses).
    ``multiprobe`` adds every Hamming-1 key per table (m extra probes)."""
    sigs = df.select(
        F.col(id_col).alias("id"),
        *[
            lsh_bucket_signature(
                F.col(vec_col), dim, n_planes, plane_offset=t * n_planes
            ).alias(f"__b{t}")
            for t in range(tables)
        ],
    )
    if multiprobe:
        # NB: the HOF lambda must stay unary — pyspark binds a second
        # parameter to the element INDEX, so a `lambda key, t=t` default-arg
        # closure would silently replace the table number with the index
        def probe_structs(t: int):
            return F.transform(
                _probe_signatures(F.col(f"__b{t}"), n_planes),
                lambda key: F.struct(F.lit(t).alias("t"), key.alias("key")),
            )

        band_arr = F.flatten(F.array(*[probe_structs(t) for t in range(tables)]))
    else:
        band_arr = F.array(
            *[
                F.struct(F.lit(t).alias("t"), F.col(f"__b{t}").alias("key"))
                for t in range(tables)
            ]
        )
    return sigs.select("id", F.explode(band_arr).alias("bk")).select(
        "id", F.col("bk.t").alias("t"), F.col("bk.key").alias("key")
    )


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 1,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate cosine top-k: compare only (query, corpus) pairs sharing
    a bucket in at least one of ``tables`` random-hyperplane tables.

    Scale shape: the corpus is bucketed once per table (linear scan, one
    shuffle on the band key), queries are broadcast; candidates per query
    ≈ L·n/2^m instead of n. The (m, L) trade is the standard OR-of-ANDs:
    recall 1-(1-p^m)^L. Measured operating points are recorded in
    COVERAGE.md — including the honest negative result that for
    weak-similarity neighbors (cosine ≈ 0.4, p ≈ 0.6) no setting prunes
    much below brute force; the construction earns its keep when neighbor
    similarity is high (true near-dups, p ≥ 0.85). ``multiprobe`` probes
    Hamming-1 query buckets per table (m extra probes per table)."""
    c = _table_buckets(vectors, dim, n_planes, tables, id_col, vec_col)
    qb = _table_buckets(
        queries, dim, n_planes, tables, id_col, vec_col, multiprobe=multiprobe
    )
    cand = (
        c.join(
            F.broadcast(qb.select(F.col("id").alias("qid"), "t", "key")),
            on=["t", "key"],
        )
        .filter(F.col("id") != F.col("qid"))
        .select(F.col("qid").alias("query_id"), F.col("id").alias("neighbor_id"))
    )
    if tables > 1 or multiprobe:
        cand = cand.distinct()  # a pair can collide in several tables/probes
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cv = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cosine")
    )
    return top_k_per_group(
        scored, ["query_id"], [F.desc("cosine"), F.asc("neighbor_id")], k, rank_col="rnk"
    )


def neighbor_pairs_lsh(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.4,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 1,
    multiprobe: bool = False,
) -> DataFrame:
    """Embedding near-dup pairs, LSH-bucketed — the DECLARED near-dup
    operator (the brute-force all-pairs q27b form is a bounded oracle
    fixture only; an O(n²) cross join is not a 100 TB plan).

    Self-join within per-table signature buckets (same banding shape as
    MinHash-LSH in textdedup): the shuffle is keyed on (table, key),
    candidates ≈ L·n²/2^m instead of n², each surviving candidate pays one
    exact cosine. ``tables``/``multiprobe`` set the recall operating point
    exactly as in :func:`cosine_topk_lsh` (measured points in COVERAGE.md).
    """
    buckets = _table_buckets(vectors, dim, n_planes, tables, id_col, vec_col)
    a = buckets.alias("a")
    b = (
        _table_buckets(
            vectors, dim, n_planes, tables, id_col, vec_col, multiprobe=multiprobe
        ).alias("b")
        if multiprobe
        else buckets.alias("b")
    )
    # shuffle-hash: both sides are corpus-sized — refuse a broadcast that
    # local stats would allow but scale forbids (same rule as textdedup)
    cand = (
        a.hint("shuffle_hash")
        .join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"))
    )
    if tables > 1 or multiprobe:
        cand = cand.distinct()
    va = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    vb = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cosine", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def quantize_embeddings(
    vectors: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: (…, qvec: array<tinyint>,
    qscale: double) with ``x ≈ qvec[i] * qscale``. 4x smaller than float32
    (16x vs float64) — at 100 TB the quantized corpus is what gets stored
    in the ANN silver layout and shuffled through candidate joins, so the
    byte shrink is a direct shuffle/scan win, not a micro-optimization.

    Determinism contract: quantization is ``floor(x·127/m + 0.5)`` (m =
    per-vector max |x|) — floor is exact in every engine, so the codes are
    bit-identical in Spark and any SQL oracle, unlike round() whose
    half-case direction is engine-specific. Max quantization error per
    component is m/254. Zero vectors quantize to all-zero codes, qscale 0.

    Columns other than ``vec_col`` pass through untouched (so cluster ids,
    doc metadata, etc. ride along into the silver layout).
    """
    m_expr = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    # bind m in its own projection so the O(d) max is evaluated once per
    # row, not re-inlined per element inside the transform lambda
    pre = vectors.select("*", m_expr.alias("__m"))
    qvec = F.when(
        F.col("__m") > 0,
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * 127.0 / F.col("__m") + 0.5).cast(
                "tinyint"
            ),
        ),
    ).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0).cast("tinyint")))
    return pre.select(
        *[c for c in vectors.columns if c != vec_col],
        qvec.alias("qvec"),
        (F.col("__m") / 127.0).alias("qscale"),
    )


def dequantize(qvec: Column, qscale: Column) -> Column:
    """array<double> reconstruction ``qvec[i] * qscale``."""
    return F.transform(qvec, lambda e: e.cast("double") * qscale)


def cosine_topk_quantized(
    quantized: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against an int8-quantized corpus — same
    contract as ``cosine_topk`` but the corpus side streams tinyint codes.

    Cosine is scale-invariant, so ranking against the raw integer codes
    equals ranking against the dequantized vectors exactly (qscale > 0
    cancels out of the ratio) — the per-element dequant multiply is skipped
    entirely; only the quantization rounding itself costs recall.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = quantized.select(F.col(id_col).alias("neighbor_id"), F.col("qvec"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine(F.col("qv"), F.col("qvec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        k,
        rank_col="rnk",
    )


def neighbor_pairs_ivf(
    vectors: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs, k-means-bucketed (the SemDeDup shape:
    Abbas et al. 2023 — cluster the corpus once, compare only WITHIN a
    cluster). The data-ADAPTIVE counterpart of :func:`neighbor_pairs_lsh`:
    random hyperplanes split the space blindly, while fitted centroids put
    the comparison budget where the density is — near-dups sit next to
    each other by construction, so same-cluster candidacy catches them at
    nprobe=1 cost. Reuses the IVF quantizer (``operators.ivf.ivf_fit`` /
    ``load_centroids``) — one fitted artifact serves search (q54) and
    dedup.

    Candidates are Σ c_i²/2 over cluster sizes instead of n²/2; the
    shuffle is keyed on the int cluster id. ``max_cluster_size`` is the
    skew lever (same contract as ``minhash_lsh_pairs.max_bucket_size``):
    clusters above the cap — quantizer failure modes, e.g. a dead-center
    catch-all — are EXCLUDED from pair generation rather than allowed to
    go quadratic; pairs inside them are missed (documented trade, they
    need a finer quantizer, not a bigger join).

    Returns (vec_a, vec_b, cosine) with vec_a < vec_b, cosine ≥ threshold.
    Cross-cluster near-dups (borderline vectors quantized apart) are the
    recall trade vs the LSH multiprobe variant — measured in
    tests/test_semantic_dedup.py.
    """
    from crossbar_data_process_spark.operators.ivf import ivf_assign

    # Precompute the norm ONCE per vector: every vector meets
    # ~cluster_size candidates, and cosine() would recompute BOTH norms
    # per PAIR — carrying the scalar norm makes each candidate one dot
    # product plus a scalar divide, ~3x less array work on the pair
    # stage (scripts/semdedup_probe.py). (Not done by pre-dividing into
    # unit vectors: a transform lambda that captures an outer column
    # miscompiles under self-join attribute dedup — INTERNAL_ERROR
    # ATTRIBUTE_NOT_FOUND on generated-expression sources.)
    assigned = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("n"),
        ivf_assign(F.col(vec_col), centroids).alias("cluster"),
    )
    if max_cluster_size is not None:
        sizes = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("__csz")
        )
        assigned = (
            assigned.join(F.broadcast(sizes), "cluster")
            .filter(F.col("__csz") <= max_cluster_size)
            .drop("__csz")
        )
    a = assigned.alias("a")
    b = assigned.alias("b")
    # shuffle-hash: both sides are corpus-sized — refuse a broadcast that
    # local stats would allow but scale forbids (same rule as textdedup)
    return (
        a.hint("shuffle_hash")
        .join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.id") < F.col("b.id")),
        )
        # precomputed norms => ONE dot per candidate, same 1e-6 rounding
        # and try_divide zero-norm semantics as cosine() (ANSI mode: a
        # plain / on a 0 divisor aborts the job; NULL is dropped by the
        # threshold filter — zero vectors pair with nothing)
        .withColumn(
            "cosine",
            F.round(
                F.try_divide(
                    dot(F.col("a.v"), F.col("b.v")),
                    F.col("a.n") * F.col("b.n"),
                ),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("vec_a"),
            F.col("b.id").alias("vec_b"),
            "cosine",
        )
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup end-to-end: k-means-bucketed cosine pairs →
    connected components → one surviving representative per semantic
    cluster (min id). Same survivors contract as
    ``textdedup.resolve_neardups`` — returns (``id_col``, cluster_size)
    covering the whole corpus, untouched vectors surviving with
    cluster_size 1 — so text and embedding dedup plug into the same
    downstream (curation funnels, incremental ingest).

    Scale: the pair stage is Σ c_i² (cluster-bounded, never n²); the
    component resolution touches only pair-involved ids
    (``resolve_neardups``'s contract). At 100 TB this is one silver of
    assignments + a per-cluster self-join — the corpus is shuffled once,
    on the cluster id."""
    from crossbar_data_process_spark.operators.textdedup import (
        resolve_neardups,
    )

    pairs = neighbor_pairs_ivf(
        vectors, centroids, threshold, id_col, vec_col, max_cluster_size
    )
    return resolve_neardups(
        vectors.select(id_col), pairs, id_col, "vec_a", "vec_b"
    )
