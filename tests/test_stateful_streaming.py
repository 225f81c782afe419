"""applyInPandasWithState test: per-user running totals maintained across
micro-batches must converge to the batch groupBy result (last update per
user wins in the memory sink)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from crossbar_data_process_spark.sources.readers import load_events
from crossbar_data_process_spark.streaming.pipelines import stream_events
from crossbar_data_process_spark.streaming.stateful import running_user_totals

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def chunks(spark):
    tmp = tempfile.mkdtemp(prefix="events_state_")
    (
        load_events(spark, f"{SF_DIR}/events.parquet")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_running_totals_converge_to_batch(spark, chunks):
    stream = stream_events(spark, chunks)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)

    # the memory sink accumulates one row per (batch, touched user);
    # with cumulative state the max n_events per user is the final total
    final = (
        spark.table("running")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    expected = (
        spark.read.parquet(chunks)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {(r.user_id, r.n_events) for r in final.collect()}
    want = {(r.user_id, r.n_events) for r in expected.collect()}
    assert got == want
