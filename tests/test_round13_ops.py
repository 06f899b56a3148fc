"""Round-13 operator tests: q229 (deletion propagation racing live
ingest) and q230 (the nprobe recall/cost sweep). The oracle hash gate
proves value equality; these pin the INDEX-side invariants the oracle
cannot see — store layout after the scrub→resume interleaving, absence
of denied keys in every layout layer, idempotent re-entry, and the
sweep's monotone recall/cost contract.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.ivf_index import (
    IVF_MEMBER_COLS,
    _VEC_DENY_MOD,
    ensure_govlive_ivf_membership,
    q229_ivf_scrub_under_ingest,
    q230_ivf_nprobe_sweep,
    q231_ivf_centroid_refresh,
)
from etl_entregas_pyspark_spark.streaming.epoch_store import (
    EpochStore,
    read_pointer,
)
from tests.conftest import SF_DIR


class TestQ229ScrubUnderIngest:
    def test_no_denied_key_in_any_layout_layer(self, spark):
        path = ensure_govlive_ivf_membership(spark, SF_DIR)
        members = EpochStore(path, IVF_MEMBER_COLS).read(spark)
        denied = members.filter(F.col("vec_id") % _VEC_DENY_MOD == 2)
        assert denied.count() == 0

    def test_membership_is_exactly_corpus_minus_denied(self, spark):
        path = ensure_govlive_ivf_membership(spark, SF_DIR)
        members = EpochStore(path, IVF_MEMBER_COLS).read(spark)
        e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        expected = e.filter(
            (F.col("vec_id") >= 16) & (F.col("vec_id") % _VEC_DENY_MOD != 2)
        )
        got = sorted(r.vec_id for r in members.select("vec_id").collect())
        want = sorted(r.vec_id for r in expected.select("vec_id").collect())
        assert got == want  # each exactly once: no dup across base/epoch

    def test_layout_is_scrubbed_base_plus_postscrub_epoch(self, spark):
        path = ensure_govlive_ivf_membership(spark, SF_DIR)
        ptr = read_pointer(path)
        # the scrub compacted epochs 0-1 into a base; epoch 2 landed after
        assert ptr["epoch"] == 2
        assert ptr.get("base_version") is not None
        assert ptr["base_through_epoch"] == 1
        assert os.path.isdir(os.path.join(path, "epoch=2"))
        assert not os.path.isdir(os.path.join(path, "epoch=0"))

    def test_ensure_is_idempotent(self, spark):
        path = ensure_govlive_ivf_membership(spark, SF_DIR)
        v = read_pointer(path)["version"]
        assert ensure_govlive_ivf_membership(spark, SF_DIR) == path
        assert read_pointer(path)["version"] == v  # untouched on re-entry

    def test_probe_never_returns_denied_neighbor(self, spark):
        out = q229_ivf_scrub_under_ingest(spark, SF_DIR)
        bad = out.filter(F.col("neighbor_id") % _VEC_DENY_MOD == 2)
        assert bad.count() == 0


class TestQ230NprobeSweep:
    def test_monotone_recall_and_cost_reaching_exhaustive(self, spark):
        rows = q230_ivf_nprobe_sweep(spark, SF_DIR).orderBy("nprobe").collect()
        assert [r.nprobe for r in rows] == [1, 2, 4, 8]
        recalls = [r.recall_at_k for r in rows]
        costs = [r.n_candidates for r in rows]
        assert recalls == sorted(recalls)  # more lists, never less recall
        assert costs == sorted(costs)  # and strictly more scan cost
        assert costs[0] < costs[-1]
        # exhaustive probe == brute force by construction
        assert recalls[-1] == 1.0
        assert all(0.0 <= r <= 1.0 for r in recalls)

    def test_every_query_counted_at_every_level(self, spark):
        rows = q230_ivf_nprobe_sweep(spark, SF_DIR).collect()
        n_queries = {r.n_queries for r in rows}
        assert n_queries == {8}  # vec_id 8..15 at every level


class TestQ231CentroidRefresh:
    def test_migration_flow_conserves(self, spark):
        rows = q231_ivf_centroid_refresh(spark, SF_DIR).collect()
        assert len(rows) == 8  # one audit row per centroid
        e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        corpus_n = e.filter(F.col("vec_id") >= 16).count()
        # every committed member appears exactly once on the 'from' side
        assert sum(r.n_members for r in rows) == corpus_n
        # a vector leaving one bucket arrives in exactly one other
        assert sum(r.n_out for r in rows) == sum(r.n_in for r in rows)
        for r in rows:
            assert 0 <= r.n_stay <= r.n_members
            assert r.n_out == r.n_members - r.n_stay
            assert 0.0 <= r.churn <= 1.0
            if r.n_members:
                assert r.churn == r.n_out / r.n_members
            else:
                assert r.churn == 0.0

    def test_deterministic_across_runs(self, spark):
        a = sorted(map(tuple, q231_ivf_centroid_refresh(spark, SF_DIR).collect()))
        b = sorted(map(tuple, q231_ivf_centroid_refresh(spark, SF_DIR).collect()))
        assert a == b
