"""applyInPandasWithState: after the stream drains, the latest emitted
per-user state must equal the batch aggregate over all input."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.events import E
from etl_entregas_pyspark_spark.streaming import read_event_stream
from etl_entregas_pyspark_spark.streaming.stateful import running_user_totals
from etl_entregas_pyspark_spark.timeutil import epoch_us, epoch_us_sql


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="events_state_")
    E(spark, sf_dir).repartition(4).write.mode("overwrite").parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_running_totals_match_batch(spark, events_dir):
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # update mode appends one row per (user, batch); the LAST row per user
    # is the final state
    emitted = spark.table("user_totals")
    w = (
        emitted.withColumn("rn", F.monotonically_increasing_id())
        .groupBy("user_id")
        .agg(F.max_by(F.struct("n_events", "total_value", "last_ts"), "rn").alias("s"))
        .select("user_id", "s.n_events", "s.total_value", "s.last_ts")
    )
    got = {r.user_id: (r.n_events, round(r.total_value, 6), r.last_ts) for r in w.collect()}

    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
    )
    want = {
        r.user_id: (r.n_events, round(r.total_value, 6), r.last_ts) for r in batch.collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], u
        assert got[u][1] == pytest.approx(want[u][1], rel=1e-9), u
        assert got[u][2] == want[u][2], u


def test_streaming_debounce_matches_batch(spark, sf_dir):
    """The stateful streaming debounce must keep exactly the events the
    batch operator keeps, given per-key time-ordered arrival (time-slice
    files written oldest-first with distinct mod-times, one per
    trigger)."""
    import os
    import shutil
    import tempfile
    import time

    from etl_entregas_pyspark_spark.queries.events import debounce
    from etl_entregas_pyspark_spark.streaming.stateful import streaming_debounce

    src = tempfile.mkdtemp(prefix="events_debounce_")
    try:
        e = E(spark, sf_dir)
        bounds = [
            r for r in e.selectExpr(
                "percentile(" + epoch_us_sql("ts") + ", 0.25) AS a",
                "percentile(" + epoch_us_sql("ts") + ", 0.5) AS b",
                "percentile(" + epoch_us_sql("ts") + ", 0.75) AS c",
            ).collect()
        ][0]
        us = epoch_us("ts")
        slices = [
            e.filter(us < bounds.a),
            e.filter((us >= bounds.a) & (us < bounds.b)),
            e.filter((us >= bounds.b) & (us < bounds.c)),
            e.filter(us >= bounds.c),
        ]
        # FileStreamSource orders by modification time: write oldest time
        # slice first, with >1s between writes so mod-times are distinct
        for s in slices:
            s.coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        q = (
            streaming_debounce(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("debounced")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {r.event_id for r in spark.table("debounced").collect()}
        want = {r.event_id for r in debounce(spark.read.parquet(src)).collect()}
        assert got == want and len(want) > 0
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_streaming_transitions_match_batch(spark, sf_dir):
    """Replaying the events table in four time-ordered slices must yield
    exactly the batch q120 transition counts — including pairs that span
    a trigger boundary (carried by the state store)."""
    import shutil
    import tempfile
    import time
    from collections import Counter

    from etl_entregas_pyspark_spark.queries.events import transition_counts
    from etl_entregas_pyspark_spark.streaming.stateful import streaming_transitions

    src = tempfile.mkdtemp(prefix="events_transitions_")
    try:
        e = E(spark, sf_dir)
        bounds = e.selectExpr(
            "percentile(" + epoch_us_sql("ts") + ", 0.25) AS a",
            "percentile(" + epoch_us_sql("ts") + ", 0.5) AS b",
            "percentile(" + epoch_us_sql("ts") + ", 0.75) AS c",
        ).collect()[0]
        us = epoch_us("ts")
        slices = [
            e.filter(us < bounds.a),
            e.filter((us >= bounds.a) & (us < bounds.b)),
            e.filter((us >= bounds.b) & (us < bounds.c)),
            e.filter(us >= bounds.c),
        ]
        for s in slices:
            s.coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        q = (
            streaming_transitions(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("transitions")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = Counter(
            (r.from_type, r.to_type)
            for r in spark.table("transitions").collect()
        )
        want = {
            (r.from_type, r.to_type): r.n
            for r in transition_counts(spark.read.parquet(src)).collect()
        }
        assert dict(got) == want and len(want) > 0
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_streaming_attribution_matches_batch(spark, sf_dir):
    """Replaying the events table in four time-ordered slices must classify
    every purchase exactly as the batch q146 window does — including
    purchases whose attributing click arrived in an EARLIER trigger
    (carried by the one-long-per-user state)."""
    import shutil
    import tempfile
    import time

    from etl_entregas_pyspark_spark.queries.events import attribute_purchases
    from etl_entregas_pyspark_spark.streaming.stateful import streaming_attribution

    src = tempfile.mkdtemp(prefix="events_attr_")
    try:
        e = E(spark, sf_dir)
        bounds = e.selectExpr(
            "percentile(" + epoch_us_sql("ts") + ", 0.25) AS a",
            "percentile(" + epoch_us_sql("ts") + ", 0.5) AS b",
            "percentile(" + epoch_us_sql("ts") + ", 0.75) AS c",
        ).collect()[0]
        us = epoch_us("ts")
        slices = [
            e.filter(us < bounds.a),
            e.filter((us >= bounds.a) & (us < bounds.b)),
            e.filter((us >= bounds.b) & (us < bounds.c)),
            e.filter(us >= bounds.c),
        ]
        for s in slices:
            s.coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        q = (
            streaming_attribution(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("attributed")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {r.event_id: r.bucket for r in spark.table("attributed").collect()}
        want = {
            r.event_id: r.bucket
            for r in attribute_purchases(spark.read.parquet(src)).collect()
        }
        assert got == want and len(want) > 0
        assert "attributed" in set(want.values())  # non-degenerate corpus
    finally:
        shutil.rmtree(src, ignore_errors=True)
