"""Crash-injection and race-injection property tests for the shared
``EpochStore`` (r11 VERDICT #5): the one transaction-log recipe behind the
band-index sink, the batch bootstrap/scrub paths, and the IVF membership
commit. Every hook point simulates dying (or a concurrent commit landing)
between a data write and the pointer swing; after each injected fault the
committed state must be exactly what the pointer claims — no lost rows,
no double-counted rows, and a clean re-run must converge.
"""

from __future__ import annotations

import fcntl
import os
import threading

import pytest
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.streaming.epoch_store import (
    TEST_HOOKS,
    EpochStore,
    pointer_lock,
    read_pointer,
)

COLS = ["k", "v"]


@pytest.fixture(autouse=True)
def _clear_hooks():
    TEST_HOOKS.clear()
    yield
    TEST_HOOKS.clear()


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _rows(spark, store):
    df = store.read(spark)
    return sorted((r.k, r.v) for r in df.collect()) if df is not None else []


def _want(*ranges):
    return sorted((k, k * 10) for lo, hi in ranges for k in range(lo, hi))


class TestFencingAndSeed:
    def test_seed_is_idempotent(self, spark, tmp_path):
        s = EpochStore(str(tmp_path / "s"), COLS)
        assert s.seed(_df(spark, 0, 5)) is True
        assert s.seed(_df(spark, 100, 200)) is False  # committed → untouched
        assert _rows(spark, s) == _want((0, 5))

    def test_append_fences_redelivery(self, spark, tmp_path):
        s = EpochStore(str(tmp_path / "s"), COLS)
        assert s.append(_df(spark, 0, 5), 0) is True
        assert s.append(_df(spark, 5, 9), 1) is True
        assert s.append(_df(spark, 900, 999), 1) is False  # re-delivery
        assert _rows(spark, s) == _want((0, 9))

    def test_extra_pointer_keys_carry_through_appends(self, spark, tmp_path):
        s = EpochStore(str(tmp_path / "s"), COLS)
        s.append(_df(spark, 0, 5), 0)
        s.compact(spark)
        s.append(_df(spark, 5, 9), 1)
        ptr = s.pointer()
        assert ptr["base_version"] is not None  # append preserved the base
        assert ptr["base_through_epoch"] == 0
        assert _rows(spark, s) == _want((0, 9))


class TestCrashInjection:
    """Kill between the data write and the pointer swing, at every step."""

    def test_crash_after_epoch_write_is_invisible_then_recovers(
        self, spark, tmp_path
    ):
        s = EpochStore(str(tmp_path / "s"), COLS)
        s.append(_df(spark, 0, 5), 0)
        TEST_HOOKS["append_after_epoch_write"] = _boom
        with pytest.raises(RuntimeError):
            s.append(_df(spark, 5, 9), 1)
        TEST_HOOKS.clear()
        assert _rows(spark, s) == _want((0, 5))  # orphan dir fenced out
        assert s.pointer()["epoch"] == 0
        # recovery re-delivers the epoch: overwrite + commit
        assert s.append(_df(spark, 5, 9), 1) is True
        assert _rows(spark, s) == _want((0, 9))

    def test_crash_after_base_write_keeps_old_state_and_rerunnable(
        self, spark, tmp_path
    ):
        s = EpochStore(str(tmp_path / "s"), COLS)
        s.append(_df(spark, 0, 5), 0)
        s.append(_df(spark, 5, 9), 1)
        TEST_HOOKS["compact_after_base_write"] = _boom
        with pytest.raises(RuntimeError):
            s.compact(spark)
        TEST_HOOKS.clear()
        # orphan base never resolved; both epoch dirs still committed
        assert _rows(spark, s) == _want((0, 9))
        assert s.pointer().get("base_version") is None
        # the re-run converges
        n = s.compact(spark)
        assert n == 9
        assert _rows(spark, s) == _want((0, 9))
        assert not any(
            e.startswith("epoch=") for e in os.listdir(s.path)
        )

    def test_crash_after_scrub_base_write_never_half_deletes(
        self, spark, tmp_path
    ):
        s = EpochStore(str(tmp_path / "s"), COLS)
        s.append(_df(spark, 0, 10), 0)
        deny = spark.range(0, 3).select(F.col("id").alias("k"))
        TEST_HOOKS["scrub_after_base_write"] = _boom
        with pytest.raises(RuntimeError):
            s.scrub(spark, deny, "k")
        TEST_HOOKS.clear()
        assert _rows(spark, s) == _want((0, 10))  # nothing half-disappeared
        n = s.scrub(spark, deny, "k")  # re-run completes the deletion
        assert n == 7
        assert _rows(spark, s) == _want((3, 10))

    def test_resurrected_absorbed_epoch_is_excluded(self, spark, tmp_path):
        s = EpochStore(str(tmp_path / "s"), COLS)
        s.append(_df(spark, 0, 5), 0)
        s.compact(spark)
        # crash mid-cleanup: an absorbed epoch dir lingers on disk
        _df(spark, 0, 5).write.mode("overwrite").parquet(
            os.path.join(s.path, "epoch=0")
        )
        assert _rows(spark, s) == _want((0, 5))  # not double-counted


class TestRaceInjection:
    """The advisory check-then-act class: a commit landing between another
    writer's data write and its pointer swing. The locked re-read must
    preserve BOTH writers' state."""

    def test_append_during_compaction_survives(self, spark, tmp_path):
        s = EpochStore(str(tmp_path / "s"), COLS)
        s.append(_df(spark, 0, 5), 0)
        s.append(_df(spark, 5, 9), 1)
        # between compact's base write and its swing, the sink commits
        # epoch 2 through a second handle
        s2 = EpochStore(s.path, COLS)
        TEST_HOOKS["compact_after_base_write"] = lambda: s2.append(
            _df(spark, 9, 12), 2
        )
        s.compact(spark)
        TEST_HOOKS.clear()
        ptr = s.pointer()
        assert ptr["epoch"] == 2  # the fresher commit kept its frontier
        assert ptr["base_through_epoch"] == 1  # base claims what it absorbed
        assert os.path.isdir(os.path.join(s.path, "epoch=2"))  # not deleted
        assert _rows(spark, s) == _want((0, 12))  # no row lost or doubled

    def test_compaction_during_scrub_keeps_fresher_epoch(
        self, spark, tmp_path
    ):
        s = EpochStore(str(tmp_path / "s"), COLS)
        s.append(_df(spark, 0, 10), 0)
        s2 = EpochStore(s.path, COLS)
        deny = spark.range(0, 2).select(F.col("id").alias("k"))
        # a sink epoch lands while the scrub is writing its filtered base:
        # the scrub's swing must keep epoch 1 visible (r11 ADVICE #3 —
        # the old scrub rolled the pointer back to its entry snapshot)
        TEST_HOOKS["scrub_after_base_write"] = lambda: s2.append(
            _df(spark, 20, 23), 1
        )
        s.scrub(spark, deny, "k")
        TEST_HOOKS.clear()
        ptr = s.pointer()
        assert ptr["epoch"] == 1
        assert _rows(spark, s) == _want((2, 10), (20, 23))

    def test_pointer_lock_is_exclusive(self, tmp_path):
        d = str(tmp_path / "s")
        os.makedirs(d)
        entered = threading.Event()
        release = threading.Event()

        def holder():
            with pointer_lock(d):
                entered.set()
                release.wait(10)

        t = threading.Thread(target=holder)
        t.start()
        assert entered.wait(10)
        # a second writer cannot take the lock while it is held
        with open(os.path.join(d, "_COMMITTED.json.lock"), "a") as f:
            with pytest.raises(BlockingIOError):
                fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        release.set()
        t.join(10)
        with open(os.path.join(d, "_COMMITTED.json.lock"), "a") as f:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)  # now free
            fcntl.flock(f, fcntl.LOCK_UN)
        assert read_pointer(d) == {"epoch": -1, "version": 0}


def _boom():
    raise RuntimeError("injected crash between write and pointer swing")
