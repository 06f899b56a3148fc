"""Property-based tests (hypothesis) for the event-analytics operators:
the distributed window formulations must agree with brute-force Python
models on ARBITRARY event streams, not just the shipped testdata.
"""

from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from etl_entregas_pyspark_spark.queries.events import funnel_stages, sessionize

_T0 = datetime(2024, 1, 1)
_GAP_US = 30 * 60 * 1_000_000

_EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("event_id", LongType(), False),
        StructField("event_type", StringType(), False),
    ]
)

# offsets in seconds; a few users; the three funnel types plus noise
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=6 * 3600),
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=80,
)


def _mkdf(spark, rows):
    data = [
        (u, _T0 + timedelta(seconds=s), i, t) for i, (u, s, t) in enumerate(rows)
    ]
    return spark.createDataFrame(data, _EVENT_SCHEMA).repartition(4)


@settings(max_examples=10, deadline=None)
@given(events_strategy)
def test_sessionize_matches_python_model(spark_sess, rows):
    got = {
        (r.user_id, r.ts, ): r.session_id
        for r in sessionize(_mkdf(spark_sess, rows)).collect()
    }
    # brute force: per user, time-ordered, cut on gap > 30 min
    by_user = {}
    for i, (u, s, t) in enumerate(rows):
        by_user.setdefault(u, []).append((_T0 + timedelta(seconds=s), i))
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for ts, _i in evs:
            if prev is None or (ts - prev).total_seconds() * 1_000_000 > _GAP_US:
                sid += 1
            prev = ts
            assert got[(u, ts)] == sid, (u, ts, got[(u, ts)], sid)
    # total assignment count preserved (dict keys collapse same (u, ts) —
    # identical timestamps get identical session ids, so this is safe)
    assert len(got) == len({(u, _T0 + timedelta(seconds=s)) for u, s, _ in rows})


@settings(max_examples=10, deadline=None)
@given(events_strategy)
def test_funnel_matches_python_model(spark_sess, rows):
    got = {r.user_id: (r.t_view, r.t_click, r.t_purchase)
           for r in funnel_stages(_mkdf(spark_sess, rows)).collect()}
    users = {u for u, _, _ in rows}
    assert set(got) == users
    for u in users:
        evs = sorted(
            (_T0 + timedelta(seconds=s), t) for uu, s, t in rows if uu == u
        )
        t1 = min((ts for ts, t in evs if t == "view"), default=None)
        t2 = (
            min((ts for ts, t in evs if t == "click" and t1 and ts > t1), default=None)
            if t1 else None
        )
        t3 = (
            min((ts for ts, t in evs if t == "purchase" and t2 and ts > t2), default=None)
            if t2 else None
        )
        assert got[u] == (t1, t2, t3), (u, got[u], (t1, t2, t3))
        # funnel monotonicity: a later stage implies every earlier stage
        assert not (t3 and not t2) and not (t2 and not t1)


@pytest.fixture(scope="module")
def spark_sess(spark):
    return spark
