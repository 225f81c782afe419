"""S8: cache / retry orchestration for bronze landings (SURVEY §2.1).

The reference wraps every downloader in a retry context and a cache
toggle (``ExitStack`` + ``settings.context(retries=n)`` +
``curl.cache_off()``: ppi.py:83-90, domain.py:41-49, go.py:212-220,
ec.py:86-93) — per-call plumbing around pypath's HTTP layer. The
Spark-idiomatic equivalent is job-level, not call-level:

- :func:`with_retries` — bounded retry with deterministic backoff for the
  FETCH step (the only part that can transiently fail; everything after
  it is Spark and either succeeds or the job legitimately dies);
- :func:`land_bronze` — idempotent manifest-gated landing: if a previous
  run completed (manifest present), the fetch is SKIPPED and the landed
  parquet is read back — the reference's download cache, re-expressed as
  a data-layer property instead of hidden HTTP-client state. The write
  is write-then-manifest, so a crash mid-write leaves no manifest and the
  next run redoes the landing instead of reading a torn snapshot.

At 100 TB the same shape holds on an object store: tasks write to a
per-attempt prefix, the manifest commit is the atomicity point, and
re-running an orchestrator DAG node is free when the manifest exists.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession

T = TypeVar("T")

_MANIFEST = "_LANDING_MANIFEST.json"


def with_retries(
    fn: Callable[[], T],
    attempts: int = 3,
    backoff_s: float = 1.0,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run ``fn`` with up to ``attempts`` tries and linear backoff
    (deterministic — no jitter, so test runs and replays behave
    identically). Raises the LAST error when exhausted."""
    if attempts < 1:
        raise ValueError("attempts must be >= 1")
    last: BaseException | None = None
    for i in range(attempts):
        try:
            return fn()
        except retry_on as e:  # noqa: PERF203 - retry loop is the point
            last = e
            if i + 1 < attempts:
                sleep(backoff_s * (i + 1))
    assert last is not None
    raise last


def land_bronze(
    spark: SparkSession,
    fetch: Callable[[], DataFrame],
    path: str,
    attempts: int = 3,
    backoff_s: float = 1.0,
    refresh: bool = False,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Idempotent bronze landing: return the landed table at ``path``,
    fetching (with retries) and writing it only when no completed landing
    exists. ``refresh=True`` is the reference's ``cache_off()``: ignore
    the existing landing and fetch anew."""
    manifest = os.path.join(path, _MANIFEST)
    if not refresh and os.path.exists(manifest):
        return spark.read.parquet(path)
    df = with_retries(fetch, attempts, backoff_s, sleep=sleep)
    df.write.mode("overwrite").parquet(path)
    rows = spark.read.parquet(path).count()
    with open(manifest, "w") as f:
        json.dump({"status": "complete", "rows": rows}, f)
    return spark.read.parquet(path)
