"""Streaming embedding ingest into the IVF ANN silver — the vector-side
twin of :mod:`streaming.ingest`: micro-batches of embeddings are assigned
to a FIXED fitted quantizer (``operators/ivf.ivf_fit``) and appended to
the cluster-partitioned silver that ``ivf_topk_assigned`` probes, plus a
per-batch QUANTIZER-DRIFT gauge so a corpus that drifts away from the
fitted centroids is detected instead of silently degrading recall.

Layout: ``partitionBy(cluster, __batch_id)`` — the FIRST level keeps the
probe-time dynamic partition pruning of ``write_assigned_corpus`` (reads
touch only probed lists), the second makes every batch's write land in
its own leaf partitions so a replayed ``foreachBatch`` (at-least-once
delivery) atomically replaces exactly its own data: exactly-once silver,
same contract as the text ingest. ``ivf_topk_assigned`` works on this
layout unchanged (it selects id/vector/cluster and never reads the batch
column).

Drift gauge (scale-correct monitoring): ``mean_top1`` — the mean cosine
between a batch's unit vectors and their nearest centroid — is computed
as a pure Column aggregation (``avg(array_max(scores))``, one
whole-stage-codegen pass over the batch, NO collect, no sample), so it
costs one batch-sized agg job and works at any batch size. It is the
same statistic ``operators/ivf.ivf_fit_diagnostics`` computes driver-side
at fit time, so the fit-time value is the baseline: when a later batch's
mean_top1 falls toward the isotropic floor (``quantizer_regime``), the
corpus has drifted and the quantizer should be refit. Metrics land in a
1-row-per-batch parquet table, batch-partitioned for the same replay
safety.

Versus the reference: no counterpart (pure pandas, no vectors, no
streaming) — engine charter (SURVEY.md §7; "similarity search ... as the
scale path").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crossbar_data_process_spark.streaming.ingest import (
    BATCH_COL,
    _fs_and_path,
    _hadoop_read_text,
    _write_batch_partition,
)

_CLUSTER_COL = "cluster"
_CENTROID_META = "_centroid_meta.json"


def centroid_fingerprint(centroids: list[list[float]]) -> str:
    """Deterministic identity of a centroid matrix: md5 over the JSON
    rendering of the float values. Two quantizers that assign even one
    vector differently have different matrices, hence different
    fingerprints; the same fitted matrix always reproduces the same
    digest (json float repr is deterministic)."""
    import hashlib
    import json

    payload = json.dumps(
        [[float(x) for x in row] for row in centroids]
    ).encode("utf-8")
    return hashlib.md5(payload).hexdigest()


def _write_centroid_meta(
    spark: SparkSession, silver_dir: str, centroids: list[list[float]]
) -> None:
    import json

    from crossbar_data_process_spark.sources.writers import _hadoop_write_text

    _hadoop_write_text(
        spark,
        f"{silver_dir}/{_CENTROID_META}",
        json.dumps(
            {
                "fingerprint": centroid_fingerprint(centroids),
                "nlist": len(centroids),
                "dim": len(centroids[0]),
            }
        ),
    )


def check_centroid_meta(
    spark: SparkSession, silver_dir: str, centroids: list[list[float]]
) -> bool:
    """The centroid matrix is part of the silver's identity (the vector
    twin of the text index's LSH parameters, ``ingest._check_index_meta``):
    batches assigned under DIFFERENT centroids land in clusters that mean
    something else, so pruned-probe (nprobe < nlist) recall silently
    degrades with no error anywhere (r9 ADVICE). Raises on a fingerprint
    mismatch; returns whether a sidecar was present and verified (a
    pre-metadata silver is accepted for back-compat — the caller warns
    and leaves it unstamped)."""
    import json

    meta_uri = f"{silver_dir}/{_CENTROID_META}"
    fs, jpath = _fs_and_path(spark, meta_uri)
    if not fs.exists(jpath):
        return False
    want = json.loads(_hadoop_read_text(spark, meta_uri))
    got = {
        "fingerprint": centroid_fingerprint(centroids),
        "nlist": len(centroids),
        "dim": len(centroids[0]),
    }
    if want != got:
        raise ValueError(
            f"IVF silver at {silver_dir} was built with a different "
            f"quantizer (stored {want}, writer has {got}): appending "
            "batches assigned under new centroids to lists assigned "
            "under old ones silently degrades pruned-probe recall — "
            "rebuild the silver (or restore the original centroids)"
        )
    return True


def ivf_ingest_writer(
    spark: SparkSession,
    centroids: list[list[float]],
    silver_dir: str,
    metrics_dir: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = False,
):
    """``foreachBatch`` factory. Per (batch_df, batch_id):

    1. assign every vector to its nearest centroid — a pure projection
       against the literal centroid matrix (no join, no shuffle);
    2. write to ``silver_dir`` under ``(cluster, __batch_id=N)`` with
       dynamic partition overwrite (replay-safe append to the probed
       layout);
    3. if ``metrics_dir`` is given, write one metrics row for the batch:
       (n_vectors, mean_top1, min_top1) — the distributed drift gauge.

    ``quantize=True`` stores int8 codes + qscale (4× smaller silver),
    matching ``write_assigned_corpus(..., quantize=True)``; assignment
    still uses the full-precision vector.
    """
    from crossbar_data_process_spark.operators.ivf import (
        _centroid_scores,
        _unit,
        ivf_assign,
    )

    # fail FAST on a quantizer-identity mismatch with the existing silver
    # (factory time, not mid-stream) — mirrors ingest._check_index_meta.
    # Stamp ONLY when this writer creates the silver; a pre-fingerprint
    # silver was assigned under UNKNOWN centroids, so stamping this
    # writer's matrix onto it would fabricate a 'verified' identity
    # (same rationale as the text index's no-stamp rule, r9 ADVICE).
    verified = check_centroid_meta(spark, silver_dir, centroids)
    fs, silver_jpath = _fs_and_path(spark, silver_dir)
    if not fs.exists(silver_jpath):
        _write_centroid_meta(spark, silver_dir, centroids)
    elif not verified:
        import warnings

        warnings.warn(
            f"IVF silver at {silver_dir} predates {_CENTROID_META} — its "
            "quantizer identity cannot be verified against this writer's "
            "centroids; leaving it unstamped. Rebuild with "
            "write_assigned_corpus (or re-create via this writer on an "
            "empty directory) to stamp a verified identity.",
            stacklevel=2,
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        assigned = batch_df.withColumn(
            _CLUSTER_COL, ivf_assign(F.col(vec_col), centroids)
        )
        if quantize:
            from crossbar_data_process_spark.operators.similarity import (
                quantize_embeddings,
            )

            assigned = quantize_embeddings(assigned, vec_col=vec_col)
        # cluster first => probe-time partition pruning; batch second =>
        # dynamic overwrite replaces exactly this batch's leaves on replay
        (
            assigned.withColumn(BATCH_COL, F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(_CLUSTER_COL, BATCH_COL)
            .parquet(silver_dir)
        )
        if metrics_dir is not None:
            top1 = F.array_max(_centroid_scores(F.col("__u"), centroids))
            metrics = (
                _unit(batch_df, vec_col, "__u")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_vectors"),
                    F.avg(top1).alias("mean_top1"),
                    F.min(top1).alias("min_top1"),
                )
            )
            _write_batch_partition(metrics, metrics_dir, batch_id)

    return _sink


def read_assigned_silver(spark: SparkSession, silver_dir: str) -> DataFrame:
    """The streamed silver without its replay bookkeeping column — same
    shape ``write_assigned_corpus`` produces (``ivf_topk_assigned`` needs
    no adapter either way; it projects id/vector/cluster)."""
    return spark.read.parquet(silver_dir).drop(BATCH_COL)
