"""Round-7 operator properties: the hub-capped link prediction (q173),
the bucketed sliding-distinct prefix sum (q174), and the live stateful
sliding-distinct stream (q175) against their uncapped / windowed / batch
references."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# q173 — cap is a pure scale guard: equal to q171 when no part exceeds it
# ---------------------------------------------------------------------------


def test_capped_link_prediction_equals_uncapped_under_max_degree(spark, sf_dir):
    from etl_entregas_pyspark_spark.queries.advanced import (
        link_prediction_pairs,
        q171_link_prediction,
    )

    capped = link_prediction_pairs(spark, sf_dir, part_degree_cap=10**9)
    base = q171_link_prediction(spark, sf_dir)
    key = lambda r: (r.c1, r.c2)  # noqa: E731
    got = {key(r): (r.n_common, r.jaccard) for r in capped.collect()}
    want = {key(r): (r.n_common, r.jaccard) for r in base.collect()}
    assert got == want and len(want) > 0


def test_capped_link_prediction_drops_hub_pairs(spark, sf_dir):
    """With the production cap, every surviving common-neighbor count must
    be attainable from non-hub parts only, and the output must be a
    subset-by-key of neither/none — i.e. recomputed degrees mean scores
    MAY differ, but no pair may rest on a hub part: lowering the cap can
    only shrink the interaction set."""
    from etl_entregas_pyspark_spark.queries.advanced import (
        _LP_CAP,
        link_prediction_pairs,
    )

    tight = link_prediction_pairs(spark, sf_dir, part_degree_cap=_LP_CAP)
    tighter = link_prediction_pairs(
        spark, sf_dir, part_degree_cap=max(1, _LP_CAP // 2)
    )
    n_tight = {(r.c1, r.c2): r.n_common for r in tight.collect()}
    n_tighter = {(r.c1, r.c2): r.n_common for r in tighter.collect()}
    # monotonicity: a smaller cap never increases any pair's common count
    for pair, cn in n_tighter.items():
        assert pair in n_tight and cn <= n_tight[pair], pair


# ---------------------------------------------------------------------------
# q174 — bucketed prefix sum is value-identical to q153's per-type window
# ---------------------------------------------------------------------------


def test_bucketed_sliding_distinct_equals_windowed(spark, sf_dir):
    from etl_entregas_pyspark_spark.queries.timeseries import (
        q153_sliding_distinct,
        q174_sliding_distinct_bucketed,
    )

    want = sorted(
        (r.event_id, r.event_type, r.ts, r.n_active_users)
        for r in q153_sliding_distinct(spark, sf_dir).collect()
    )
    got = sorted(
        (r.event_id, r.event_type, r.ts, r.n_active_users)
        for r in q174_sliding_distinct_bucketed(spark, sf_dir).collect()
    )
    assert got == want and len(want) > 0


def test_bucketed_sliding_distinct_plan_has_no_fat_type_partition(spark, sf_dir):
    """The point of q174: no windowspec partitioned by event_type ALONE
    (the 5-key fat partition q153 accepts) — every running-sum window
    must carry the bucket column too. The tiny offsets window runs over
    the (type, bucket) grid aggregate, whose input is <= types*buckets
    rows, and is the only type-partitioned spec allowed."""
    from etl_entregas_pyspark_spark.queries.timeseries import (
        q174_sliding_distinct_bucketed,
    )

    plan = (
        q174_sliding_distinct_bucketed(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    fat = [
        m.group(0)
        for m in re.finditer(r"windowspecdefinition\(event_type#\d+, tm#\d+", plan)
    ]
    assert not fat, f"per-type running sum survived the bucketing: {fat}"


# ---------------------------------------------------------------------------
# q175 — live stateful stream equals the batch interval sweep
# ---------------------------------------------------------------------------


def test_stream_sliding_distinct_matches_batch(spark, sf_dir):
    """The full live path (time-sliced replay -> applyInPandasWithState ->
    memory sink) must reproduce q153's batch sweep row-for-row, counts
    carried exactly across trigger boundaries by the state store."""
    from etl_entregas_pyspark_spark.queries.incremental import (
        q175_stream_sliding_distinct,
    )
    from etl_entregas_pyspark_spark.queries.timeseries import (
        q153_sliding_distinct,
    )

    got = {
        r.event_id: (r.event_type, r.ts, r.n_active_users)
        for r in q175_stream_sliding_distinct(spark, sf_dir).collect()
    }
    want = {
        r.event_id: (r.event_type, r.ts, r.n_active_users)
        for r in q153_sliding_distinct(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_stream_sliding_state_prunes_expired_users(spark):
    """State must track ACTIVE users only: after a quiet gap longer than
    the lookback, previously seen users may not linger in the state the
    update function re-emits."""
    import pandas as pd

    from etl_entregas_pyspark_spark.streaming.stateful import (
        _SLIDING_H_US,
        _sliding_distinct_update,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    state = FakeState()

    def batch(rows):
        return pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [pd.Timestamp(r[1] * 1000) for r in rows],
                "user_id": [r[2] for r in rows],
                "event_type": ["click"] * len(rows),
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        )

    t0 = 1_700_000_000_000_000
    out1 = list(
        _sliding_distinct_update(
            ("click",), iter([batch([(1, t0, 10), (2, t0 + 1, 11)])]), state
        )
    )[0]
    assert list(out1.n_active_users) == [1, 2]
    # second trigger: far beyond the window — old users must be pruned
    t1 = t0 + 3 * _SLIDING_H_US
    out2 = list(
        _sliding_distinct_update(("click",), iter([batch([(3, t1, 12)])]), state)
    )[0]
    assert list(out2.n_active_users) == [1]
    users, ts_us = state.get
    assert set(users) == {12}, "expired users linger in state"


def test_stream_sliding_boundary_inclusive(spark):
    """A user whose latest event is EXACTLY lookback-old still counts
    (q153's exit delta sits at last+1h+1us), one microsecond older does
    not."""
    import pandas as pd

    from etl_entregas_pyspark_spark.streaming.stateful import (
        _SLIDING_H_US,
        _sliding_distinct_update,
    )

    class FakeState:
        exists = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    def run(gap_us):
        state = FakeState()
        t0 = 1_700_000_000_000_000
        pdf = pd.DataFrame(
            {
                "event_id": [1, 2],
                "ts": [
                    pd.Timestamp(t0 * 1000),
                    pd.Timestamp((t0 + gap_us) * 1000),
                ],
                "user_id": [10, 11],
                "event_type": ["click", "click"],
                "value": [1.0, 1.0],
                "props": ["{}", "{}"],
            }
        )
        out = list(_sliding_distinct_update(("click",), iter([pdf]), state))[0]
        return list(out.n_active_users)

    assert run(_SLIDING_H_US) == [1, 2]  # exactly 1h apart: both active
    assert run(_SLIDING_H_US + 1) == [1, 1]  # 1h + 1us: first expired


# ---------------------------------------------------------------------------
# q176 — portable HLL: registers merge associatively, estimate is accurate
# ---------------------------------------------------------------------------


def test_hll_rollup_estimate_within_envelope(spark, sf_dir):
    """The 256-register estimate must land within the standard HLL error
    envelope (1.04/sqrt(256) ~ 6.5%; allow 4 sigma) of the exact count
    the query itself reports — an accuracy contract on OUR arithmetic,
    independent of the cross-engine hash check."""
    from etl_entregas_pyspark_spark.queries.sketches import (
        q176_hll_sketch_rollup,
    )

    rows = q176_hll_sketch_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel = abs(r.est_users - r.exact_users) / max(r.exact_users, 1)
        assert rel < 4 * 1.04 / (256 ** 0.5), (r.event_type, r.est_users, r.exact_users)


def test_hll_merge_equals_whole_corpus_sketch(spark, sf_dir):
    """Merge associativity — the point of a sketch table: MAX-merging the
    per-day registers must give exactly the registers a single pass over
    the whole table would build (max of maxes)."""
    from pyspark.sql import functions as F

    from etl_entregas_pyspark_spark.queries.events import E
    from etl_entregas_pyspark_spark.queries.similarity import md5_int

    e = E(spark, sf_dir)
    hashed = e.select(
        "event_type",
        F.dayofmonth("ts").alias("day"),
        md5_int(F.col("user_id").cast("string")).alias("hv"),
    )
    parts = hashed.select(
        "event_type",
        "day",
        (F.col("hv") % 256).alias("b"),
        (F.expr("hv div 256") % F.lit(4294967296)).alias("w"),
    )
    rho = parts.select(
        "event_type",
        "day",
        "b",
        F.when(F.col("w") == 0, F.lit(33))
        .otherwise(F.lit(33) - F.length(F.bin(F.col("w"))))
        .alias("r"),
    )
    via_daily = (
        rho.groupBy("event_type", "day", "b").agg(F.max("r").alias("reg"))
        .groupBy("event_type", "b").agg(F.max("reg").alias("reg"))
    )
    single_pass = rho.groupBy("event_type", "b").agg(F.max("r").alias("reg"))
    got = {(r.event_type, r.b): r.reg for r in via_daily.collect()}
    want = {(r.event_type, r.b): r.reg for r in single_pass.collect()}
    assert got == want and len(want) > 0


# ---------------------------------------------------------------------------
# q177 — JL funnel recall vs the exact q51 top-10
# ---------------------------------------------------------------------------


def test_jl_projection_recall_vs_exact(spark, sf_dir):
    """The projected-space prune keeps C=50 of ~990 candidates; the JL
    lemma says the 8-dim sign projection preserves enough geometry that
    most of the true top-10 survives. Assert recall@10 >= 0.5 overall —
    a floor far above chance (C/N ~ 5%), while leaving room for the
    probabilistic misses JL is allowed."""
    from etl_entregas_pyspark_spark.queries.similarity import (
        q51_cosine_topk,
        q177_jl_projection_topk,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in q51_cosine_topk(spark, sf_dir).collect()
    }
    jl = {
        (r.query_id, r.neighbor_id)
        for r in q177_jl_projection_topk(spark, sf_dir).collect()
    }
    assert exact
    recall = len(exact & jl) / len(exact)
    assert recall >= 0.5, f"JL recall@10 = {recall:.2f}"


# ---------------------------------------------------------------------------
# q178 — group split: leakage-free by construction
# ---------------------------------------------------------------------------


def test_group_split_no_user_spans_splits(spark, sf_dir):
    """The whole point vs q63: a user must appear in exactly ONE split,
    and the per-split user counts must partition the user population."""
    from etl_entregas_pyspark_spark.queries.datasplit import _SPLIT_BUCKETS
    from etl_entregas_pyspark_spark.queries.events import E
    from etl_entregas_pyspark_spark.queries.similarity import md5_int

    e = E(spark, sf_dir)
    bucket = md5_int(F.col("user_id").cast("string")) % _SPLIT_BUCKETS
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    per_user = (
        e.select("user_id", split.alias("split"))
        .groupBy("user_id")
        .agg(F.countDistinct("split").alias("n_splits"))
    )
    assert per_user.filter(F.col("n_splits") > 1).count() == 0

    from etl_entregas_pyspark_spark.queries.datasplit import q178_group_split

    rows = q178_group_split(spark, sf_dir).collect()
    n_users_total = e.select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users_total
    assert abs(sum(r.pct_events for r in rows) - 100.0) < 0.05


# ---------------------------------------------------------------------------
# q179 — mined roles are label-consistent and pool-optimal
# ---------------------------------------------------------------------------


def test_hard_negative_roles_are_label_consistent(spark, sf_dir):
    from pyspark.sql import functions as F2

    from etl_entregas_pyspark_spark.queries.relational import T
    from etl_entregas_pyspark_spark.queries.similarity import (
        q179_hard_negative_mining,
    )

    labels = {
        r.vec_id: r.label
        for r in T(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    rows = q179_hard_negative_mining(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.role == "positive":
            assert labels[r.neighbor_id] == labels[r.query_id], r
        else:
            assert labels[r.neighbor_id] != labels[r.query_id], r
    # at most one row per (query, role)
    seen = [(r.query_id, r.role) for r in rows]
    assert len(seen) == len(set(seen))


# ---------------------------------------------------------------------------
# q181 — exact balance and copy-skew <= 1
# ---------------------------------------------------------------------------


def test_balanced_resample_exact_parity(spark, sf_dir):
    """Every label must come out at EXACTLY the majority-class size, and
    no vector may be replicated more than one copy above its class
    floor(target/n)."""
    from etl_entregas_pyspark_spark.queries.datasplit import (
        q181_balanced_resample,
    )
    from etl_entregas_pyspark_spark.queries.relational import T

    sizes = {
        r.label: r.n
        for r in T(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    target = max(sizes.values())
    rows = q181_balanced_resample(spark, sf_dir).collect()
    assert len(rows) == len(sizes)
    for r in rows:
        assert r.n_rows == target, (r.label, r.n_rows, target)
        assert r.n_distinct == sizes[r.label]
