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
    _write_batch_partition,
)

_CLUSTER_COL = "cluster"


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
