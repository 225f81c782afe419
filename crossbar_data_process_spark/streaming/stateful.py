"""Custom stateful streaming operator (SURVEY §2.10:
``applyInPandasWithState`` for operators the built-in windows can't
express). Implements a per-key running aggregator — cumulative event count
and value sum per user, maintained in state across micro-batches — the
minimal shape of a streaming feature store.

Scale notes: state lives in the state store keyed by user; each
micro-batch touches only the keys present in the batch (Arrow-batched, one
Python worker per partition). A timeout (`GroupStateTimeout`) would evict
idle keys for unbounded key spaces; kept NoTimeout here since the driver
table's key space is small and tests need total counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, value-sum) maintained across
    micro-batches. In update output mode each batch emits the refreshed
    totals for the users it touched."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
