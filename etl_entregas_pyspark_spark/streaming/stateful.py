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
    ArrayType,
    DoubleType,
    LongType,
    StringType,
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


# ---------------------------------------------------------------------------
# streaming debounce — the live twin of queries.events.debounce (q113)
# ---------------------------------------------------------------------------

DEBOUNCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type_h", LongType()),
        StructField("ts", TimestampType()),
    ]
)

DEBOUNCE_STATE_SCHEMA = StructType([StructField("last_us", LongType())])

_DEBOUNCE_GAP_US = 5 * 60 * 1_000_000


def _debounce_update(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (last_us,) = state.get if state.exists else (None,)
    kept: list[tuple[int, int, int, int]] = []
    rows = pd.concat(list(pdf_iter), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])  # in-batch time order
    for r in rows.itertuples(index=False):
        us = int(r.ts.value // 1000)
        if last_us is None or us - last_us >= _DEBOUNCE_GAP_US:
            kept.append((int(r.event_id), int(r.user_id), int(key[1]), us))
        # the gap is measured to the previous RAW event, kept or not —
        # exactly queries.events.debounce semantics
        last_us = us
    state.update((last_us,))
    yield pd.DataFrame(
        {
            "event_id": [k[0] for k in kept],
            "user_id": [k[1] for k in kept],
            "event_type_h": [k[2] for k in kept],
            "ts": [pd.Timestamp(k[3] * 1000) for k in kept],
        }
    )


def streaming_debounce(events: DataFrame) -> DataFrame:
    """Suppress same-(user, type) events arriving within the quiet gap of
    the previous raw occurrence, with the last-seen timestamp carried in
    the state store across micro-batches.

    Equivalence with the batch operator holds when events arrive in
    per-key time order (guaranteed here by range-partitioning the source
    on ts); out-of-order arrivals would need a watermark + buffer stage
    in front, which is what q113's batch formulation is for. The state is
    ONE long per active (user, type) key — far smaller than
    dropDuplicatesWithinWatermark's per-event key set. The event_type
    group key rides as a stable 64-bit hash (event_type_h) so the state
    schema stays fixed-width."""
    from pyspark.sql import functions as F

    keyed = events.withColumn(
        "event_type_h", F.xxhash64("event_type")
    )
    return keyed.groupBy("user_id", "event_type_h").applyInPandasWithState(
        _debounce_update,
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming transition stream — the live twin of queries.events
# .transition_counts (q120): emits one row per consecutive-event pair
# ---------------------------------------------------------------------------

TRANSITION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
    ]
)

TRANSITION_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _transition_update(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last_us, last_type = state.get if state.exists else (None, None)
    rows = pd.concat(list(pdf_iter), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])  # in-batch time order
    froms: list[str] = []
    tos: list[str] = []
    for r in rows.itertuples(index=False):
        if last_type is not None:
            froms.append(last_type)
            tos.append(str(r.event_type))
        last_type = str(r.event_type)
        last_us = int(r.ts.value // 1000)
    state.update((last_us, last_type))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])] * len(froms),
            "from_type": froms,
            "to_type": tos,
        }
    )


def streaming_transitions(events: DataFrame) -> DataFrame:
    """One row per consecutive (from_type -> to_type) pair within each
    user's time-ordered stream, across micro-batch boundaries: the state
    store carries the last-seen event (one timestamp + one short string
    per active user), so a pair spanning two triggers is still emitted.
    Downstream, a plain streaming groupBy(from_type, to_type).count()
    maintains the live Markov transition matrix whose batch twin is
    oracle-checked as q120. Same ordering contract as the batch
    operator: per-key time-ordered arrival (range-partitioned source);
    out-of-order streams need a watermark buffer in front."""
    return events.groupBy("user_id").applyInPandasWithState(
        _transition_update,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming last-touch attribution — the live twin of
# queries.events.attribute_purchases (q146)
# ---------------------------------------------------------------------------

ATTRIBUTION_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("bucket", StringType()),
        StructField("value", DoubleType()),
    ]
)

ATTRIBUTION_STATE_SCHEMA = StructType([StructField("last_click_us", LongType())])

_ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # keep in lock-step with q146


def _attribution_update(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (last_click_us,) = state.get if state.exists else (None,)
    out: list[tuple[int, int, str, float]] = []
    batches = list(pdf_iter)
    if not batches:
        # Defensive only: with GroupStateTimeout.NoTimeout (as wired in
        # streaming_attribution) Spark never invokes this function with an
        # empty iterator — that path exists only for timeout-triggered
        # calls under ProcessingTime/EventTime timeouts. Kept so enabling
        # an idle-key expiry policy later (state.hasTimedOut + state.remove)
        # can't crash on the empty batch; today it is unreachable.
        yield pd.DataFrame(
            {"event_id": [], "user_id": [], "bucket": [], "value": []}
        ).astype({"event_id": "int64", "user_id": "int64", "value": "float64"})
        return
    rows = pd.concat(batches, ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])  # in-batch time order
    for r in rows.itertuples(index=False):
        us = int(r.ts.value // 1000)
        if r.event_type == "purchase":
            attributed = (
                last_click_us is not None and us - last_click_us <= _ATTR_WINDOW_US
            )
            out.append(
                (
                    int(r.event_id),
                    int(key[0]),
                    "attributed" if attributed else "organic",
                    # a NULL purchase value still attributes; carry 0.0 rather
                    # than crashing the whole query on one malformed event
                    0.0 if pd.isna(r.value) else float(r.value),
                )
            )
        # processing in (ts, event_id) order replays the batch window's
        # strictly-before frame exactly: a same-microsecond click with a
        # SMALLER event_id was already folded into last_click_us, one
        # with a larger id hasn't been — same tie semantics as q146
        if r.event_type == "click":
            last_click_us = us
    state.update((last_click_us,))
    yield pd.DataFrame(
        {
            "event_id": [o[0] for o in out],
            "user_id": [o[1] for o in out],
            "bucket": [o[2] for o in out],
            "value": [o[3] for o in out],
        }
    )


def streaming_attribution(events: DataFrame) -> DataFrame:
    """Classify purchases attributed/organic as they arrive, carrying one
    long per user (the last click time) in the state store across
    micro-batches — the live twin of q146's batch window formulation,
    equivalence-tested against it on time-sliced replays.

    State is ONE long per active user — size ∝ users, independent of
    stream length; on a cluster a ProcessingTimeTimeout of the lookback
    window would expire idle users without changing results (an expired
    key can only produce 'organic', same as absent state after 7 days).
    Same ordered-arrival contract as streaming_debounce."""
    return events.groupBy("user_id").applyInPandasWithState(
        _attribution_update,
        outputStructType=ATTRIBUTION_OUTPUT_SCHEMA,
        stateStructType=ATTRIBUTION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming sliding-window DISTINCT count — the live twin of q153/q174
# ---------------------------------------------------------------------------

SLIDING_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("n_active_users", LongType()),
    ]
)

# per-type state: the users whose LATEST event is within the lookback of
# the newest processed instant, with that latest-event time — size is
# bounded by (active users in one window), independent of stream length
SLIDING_STATE_SCHEMA = StructType(
    [
        StructField("users", ArrayType(LongType())),
        StructField("ts_us", ArrayType(LongType())),
    ]
)

_SLIDING_H_US = 3600 * 1_000_000  # keep in lock-step with q153's window


def _sliding_distinct_update(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        users, ts_us = state.get
        last = dict(zip(users, ts_us))
    else:
        last = {}
    out: list[tuple[int, int, int]] = []
    batches = list(pdf_iter)
    if batches:
        rows = pd.concat(batches, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        recs = [
            (int(r.ts.value // 1000), int(r.event_id), int(r.user_id))
            for r in rows.itertuples(index=False)
        ]
        i, n = 0, len(recs)
        while i < n:
            t = recs[i][0]
            j = i
            # apply every arrival at instant t BEFORE reading the count:
            # q153's running net folds all deltas <= t, so same-instant
            # events (multiple users, or a same-user handover whose -1/+1
            # cancels) all see the same post-update count
            while j < n and recs[j][0] == t:
                last[recs[j][2]] = t
                j += 1
            lo = t - _SLIDING_H_US  # inclusive: exit is at last+1h+1us
            last = {u: ts for u, ts in last.items() if ts >= lo}
            cnt = len(last)
            for k in range(i, j):
                out.append((recs[k][1], recs[k][0], cnt))
            i = j
    state.update((list(last.keys()), list(last.values())))
    yield pd.DataFrame(
        {
            "event_id": pd.Series([o[0] for o in out], dtype="int64"),
            "event_type": [key[0]] * len(out),
            "ts": pd.Series(
                [pd.Timestamp(o[1] * 1000) for o in out],
                dtype="datetime64[ns]",
            ),
            "n_active_users": pd.Series([o[2] for o in out], dtype="int64"),
        }
    )


def streaming_sliding_distinct(events: DataFrame) -> DataFrame:
    """The live concurrency metric: at every arriving event, the number of
    DISTINCT users of that event's type whose latest event lies in the
    trailing 1-hour window — the applyInPandasWithState twin of q153's
    interval sweep (and q174's bucketed form), equivalence-tested against
    the batch oracle on a time-sliced replay.

    State is keyed by event_type and holds (user, latest_ts) only for
    users still inside one lookback window of the newest processed
    instant — pruned as the stream advances, so state size tracks ACTIVE
    users, not stream length. Same ordered-arrival contract as
    streaming_debounce/streaming_transitions: per-key time-ordered
    micro-batches (range-partitioned replay), rows WITHIN a micro-batch
    in any order (sorted here). An out-of-order source needs a watermark
    guard in front, and Spark does NOT late-filter rows for arbitrary
    stateful ops — the concrete guard is an upstream watermarked
    stateful stage such as ``dedup_stream`` (dropDuplicatesWithin-
    Watermark drops beyond-watermark stragglers AND re-deliveries
    before they can touch this state; proven under a disordered replay
    in tests/test_disordered_replay.py)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _sliding_distinct_update,
        outputStructType=SLIDING_OUTPUT_SCHEMA,
        stateStructType=SLIDING_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
