"""Non-eager localCheckpoint with a bounded accumulator pin.

The engine materializes multi-consumer intermediates via
``localCheckpoint(eager=False)`` (not ``persist()`` — CacheManager holds
strong refs until an explicit ``unpersist`` that a returned-DataFrame
operator has no safe place to issue; ADVICE r01). That choice has one
sharp edge: when the checkpoint materializes inside the first consuming
job, Spark truncates the RDD lineage — dropping the only strong
references to the pre-checkpoint physical plan and its SQLMetrics
accumulators, which live in ``AccumulatorContext`` as WEAK refs. Under
heap pressure a JVM GC then clears them while task completions for those
very stages are still in flight, and the DAGScheduler logs
``ERROR ... attempted to access non-existent accumulator`` bursts
(observed in BENCH_r06's tail; harmless to results but noise in the one
artifact the driver parses).

Fix at the source: keep a SMALL bounded strong-ref registry of the most
recent pre-checkpoint DataFrames. While pinned, the plan's accumulators
stay strongly reachable, so late completions always find them; eviction
(``maxlen``) releases the plan AND its checkpoint blocks a few queries
later, preserving the no-session-leak property the localCheckpoint choice
bought (blocks are freed by the ContextCleaner once evicted + the caller
drops the checkpointed frame). ``maxlen=8`` covers every concurrent
checkpoint a single declared query creates, with room for interleaved
streams.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame

_RECENT: deque[DataFrame] = deque(maxlen=8)


def materialize(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint(eager=False)`` + pin (see module docstring).

    Use for every multi-consumer intermediate an operator materializes;
    lazy, so plan-building stays action-free.
    """
    _RECENT.append(df)
    return df.localCheckpoint(eager=False)


def flush_pins() -> None:
    """Drop every pinned pre-checkpoint plan (tests use this to assert
    storage is releasable; production code never needs it)."""
    _RECENT.clear()
