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


def test_crash_mid_prune_recovers_and_reprunes(spark, sf_dir, tmp_path):
    """The documented crash window: the pointer swings atomically, then
    pruning deletes superseded versions. A crash BETWEEN the two leaves
    extra stale versions — never a dangling pointer — and the next
    commit must (1) read the committed snapshot correctly and (2) prune
    the leftovers. Also pins the keep_last retention contract: with
    keep_last=N the committed version plus N-1 predecessors survive."""
    import os

    from etl_entregas_pyspark_spark.streaming.upsert_sink import (
        _commit_pointer,
        _read_pointer,
    )

    snap = str(tmp_path / "snapshot3")
    log = _to_log(E(spark, sf_dir))
    slices = [
        log.filter(F.dayofmonth("ts") <= 10),
        log.filter((F.dayofmonth("ts") > 10) & (F.dayofmonth("ts") <= 20)),
    ]
    assert upsert_batch(slices[0], 0, snap) is True
    assert upsert_batch(slices[1], 1, snap) is True

    def versions():
        return sorted(
            int(x[1:])
            for x in os.listdir(snap)
            if x.startswith("v") and x[1:].isdigit()
        )

    assert versions() == [1, 2]  # keep_last=2: committed + 1 predecessor
    # simulate the crash: epoch 2's merge wrote v3 and swung the pointer,
    # then the process died BEFORE _prune_versions ran
    third = log.filter(F.dayofmonth("ts") > 20)
    from etl_entregas_pyspark_spark.streaming.upsert_sink import merge_snapshot

    merged = merge_snapshot(read_snapshot_store(spark, snap), third)
    merged.write.mode("overwrite").parquet(os.path.join(snap, "v3"))
    _commit_pointer(snap, 2, 3)
    assert versions() == [1, 2, 3]  # stale v1 survived the crash
    # re-open: the store resolves the committed pointer, not the debris
    got = _rows(snapshot_view(read_snapshot_store(spark, snap)))
    want = _rows(q104_cdc_apply(spark, sf_dir))
    assert got == want
    # a re-delivered epoch after recovery stays a no-op and does NOT
    # prune (fencing returns before any write)
    assert upsert_batch(third, 2, snap) is False
    assert versions() == [1, 2, 3]
    # the next real commit re-prunes the crash debris down to keep_last
    fourth = log.filter(F.dayofmonth("ts") > 20).limit(50)
    assert upsert_batch(fourth, 3, snap) is True
    assert versions() == [3, 4]
    assert _read_pointer(snap) == {"epoch": 3, "version": 4}
    # a deeper retention depth keeps the longer reader window
    assert upsert_batch(fourth.limit(10), 4, snap, keep_last=3) is True
    assert versions() == [3, 4, 5]


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
