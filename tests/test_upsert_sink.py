"""Exactly-once upsert sink: the live foreachBatch MERGE must reproduce
q104's batch snapshot after a time-sliced replay, and a re-delivered
epoch must be a no-op (no double-counted ops, no value churn)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.events import E, q104_cdc_apply
from etl_entregas_pyspark_spark.streaming import read_event_stream
from etl_entregas_pyspark_spark.streaming.upsert_sink import (
    merge_snapshot,
    read_snapshot_store,
    snapshot_view,
    start_upsert_sink,
    upsert_batch,
)


def _to_log(df):
    return df.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )


def _rows(df):
    return sorted(
        (r.user_id, round(r.current_value, 6), r.updated_at, r.n_ops)
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def replay_files(spark, sf_dir):
    """The change log split into 5 time-ordered files → 5 micro-batches."""
    out = tempfile.mkdtemp(prefix="upsert_replay_")
    e = E(spark, sf_dir)
    # sortWithinPartitions after a range repartition on ts gives
    # time-sliced files: each epoch is (mostly) a contiguous time span,
    # like a real ingest; correctness must NOT depend on it
    e.repartitionByRange(5, "ts").write.mode("overwrite").parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_live_sink_matches_q104(spark, sf_dir, replay_files, tmp_path):
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    stream = _to_log(read_event_stream(spark, replay_files, max_files_per_trigger=1))
    q = start_upsert_sink(stream, snap, ckpt)
    q.processAllAvailable()
    q.stop()
    store = read_snapshot_store(spark, snap)
    got = _rows(snapshot_view(store))
    want = _rows(q104_cdc_apply(spark, sf_dir))
    assert got == want


def test_redelivered_epoch_is_noop(spark, sf_dir, tmp_path):
    snap = str(tmp_path / "snapshot2")
    log = _to_log(E(spark, sf_dir))
    first = log.filter(F.dayofmonth("ts") <= 15)
    second = log.filter(F.dayofmonth("ts") > 15)
    assert upsert_batch(first, 0, snap) is True
    assert upsert_batch(second, 1, snap) is True
    before = _rows(snapshot_view(read_snapshot_store(spark, snap)))
    # recovery re-delivers epoch 1: must be skipped, store byte-identical
    assert upsert_batch(second, 1, snap) is False
    assert upsert_batch(first, 0, snap) is False
    after = _rows(snapshot_view(read_snapshot_store(spark, snap)))
    assert before == after


def test_out_of_order_slices_converge(spark, sf_dir):
    """The fold picks winners by (ts, event_id), not arrival order: feeding
    the second half BEFORE the first must still converge to q104."""
    log = _to_log(E(spark, sf_dir))
    first = log.filter(F.dayofmonth("ts") <= 15)
    second = log.filter(F.dayofmonth("ts") > 15)
    store = merge_snapshot(None, second).localCheckpoint()
    store = merge_snapshot(store, first)
    got = _rows(snapshot_view(store))
    want = _rows(q104_cdc_apply(spark, sf_dir))
    assert got == want
