"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for semantics the built-in windowed aggregations can't
express (SURVEY §2.9 is green-field; this is the engine's pattern for
"custom stateful operator").

``running_user_totals`` keeps per-user state (event count, value sum,
last-seen timestamp) across micro-batches and emits the updated totals
every batch — the building block for online feature stores, per-entity
rate limiting, or streaming anomaly flags.

Scale notes: state lives in the state store keyed by user_id (RocksDB-
backed on a real cluster), partitioned by the groupBy key — size ∝ active
users, independent of stream length. A timeout
(``GroupStateTimeout.ProcessingTimeTimeout``) would expire idle keys; kept
NoTimeout here so the equivalence test is exact.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_us = max(last_us, int(batch_max.value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals maintained across micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
