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


# ---------------------------------------------------------------------------
# debounce / cdc_snapshot / rolling_zscore vs brute-force models
# ---------------------------------------------------------------------------

from pyspark.sql.types import DoubleType

from etl_entregas_pyspark_spark.queries.events import cdc_snapshot, debounce
from etl_entregas_pyspark_spark.queries.timeseries import rolling_zscore

_VEVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("event_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)

# (user, seconds-offset, type, centi-value) — centi units keep value*1000
# exact in double so the Python model's int quantization matches Spark's
valued_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=6 * 3600),
        st.sampled_from(["view", "click", "error"]),
        st.integers(min_value=0, max_value=50_000),
    ),
    min_size=1,
    max_size=80,
)


def _mkvdf(spark, rows):
    data = [
        (u, _T0 + timedelta(seconds=s), i, t, c / 100.0)
        for i, (u, s, t, c) in enumerate(rows)
    ]
    return spark.createDataFrame(data, _VEVENT_SCHEMA).repartition(4)


@settings(max_examples=10, deadline=None)
@given(valued_events_strategy)
def test_debounce_matches_python_model(spark_sess, rows):
    gap_us = 300 * 1_000_000
    got = {r.event_id for r in debounce(_mkvdf(spark_sess, rows), gap_us).collect()}
    keep = set()
    by_key = {}
    for i, (u, s, t, _c) in enumerate(rows):
        by_key.setdefault((u, t), []).append((s, i))
    for evs in by_key.values():
        evs.sort()
        prev = None
        for s, i in evs:
            if prev is None or (s - prev) * 1_000_000 >= gap_us:
                keep.add(i)
            # gap measured to the previous RAW event, kept or not
            prev = s
    assert got == keep


@settings(max_examples=10, deadline=None)
@given(valued_events_strategy)
def test_cdc_snapshot_matches_python_model(spark_sess, rows):
    df = _mkvdf(spark_sess, rows)
    log = df.select(
        "user_id", "event_id", "ts", "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
    )
    got = {
        r.user_id: (r.current_value, r.n_ops)
        for r in cdc_snapshot(log).collect()
    }
    by_user = {}
    for i, (u, s, t, c) in enumerate(rows):
        by_user.setdefault(u, []).append((s, i, t, c / 100.0))
    want = {}
    for u, evs in by_user.items():
        evs.sort()  # (ts, event_id) — matches the desc/desc rank inverted
        s, i, t, v = evs[-1]
        if t != "error":
            want[u] = (v, len(evs))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(valued_events_strategy)
def test_rolling_zscore_matches_python_model(spark_sess, rows):
    win, min_n, k2 = 8, 3, 9
    got = {
        r.event_id
        for r in rolling_zscore(_mkvdf(spark_sess, rows), win, min_n, k2).collect()
    }
    import math

    by_user = {}
    for i, (u, s, t, c) in enumerate(rows):
        by_user.setdefault(u, []).append((s, i, math.floor((c / 100.0) * 1000.0)))
    want = set()
    for evs in by_user.values():
        evs.sort()
        qvs = [q for _s, _i, q in evs]
        for j, (_s, i, q) in enumerate(evs):
            tail = qvs[max(0, j - win + 1): j + 1]
            n, s1, s2 = len(tail), sum(tail), sum(x * x for x in tail)
            if n >= min_n and (n * q - s1) ** 2 > k2 * (n * s2 - s1 * s1):
                want.add(i)
    assert got == want


# ---------------------------------------------------------------------------
# basket_pair_counts / transition_counts vs brute-force models
# ---------------------------------------------------------------------------

from etl_entregas_pyspark_spark.queries.advanced import basket_pair_counts
from etl_entregas_pyspark_spark.queries.events import transition_counts

_BASKET_SCHEMA = StructType(
    [
        StructField("basket", LongType(), False),
        StructField("item", LongType(), False),
    ]
)

baskets_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # basket id
        st.integers(min_value=0, max_value=9),   # item id (dups likely)
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=10, deadline=None)
@given(baskets_strategy)
def test_basket_pairs_match_python_model(spark_sess, rows):
    df = spark_sess.createDataFrame(rows, _BASKET_SCHEMA).repartition(4)
    got = {
        (r.item_a, r.item_b): r.n_baskets
        for r in basket_pair_counts(df, "basket", "item").collect()
    }
    from itertools import combinations

    by_basket = {}
    for b, i in rows:
        by_basket.setdefault(b, set()).add(i)
    want = {}
    for items in by_basket.values():
        for a, b in combinations(sorted(items), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


@settings(max_examples=10, deadline=None)
@given(events_strategy)
def test_transition_counts_match_python_model(spark_sess, rows):
    got = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in transition_counts(_mkdf(spark_sess, rows)).collect()
    }
    import math

    by_user = {}
    for i, (u, s, t) in enumerate(rows):
        by_user.setdefault(u, []).append((s, i, t))
    want_n = {}
    for evs in by_user.values():
        evs.sort()
        for (s1, i1, t1), (s2, i2, t2) in zip(evs, evs[1:]):
            want_n[(t1, t2)] = want_n.get((t1, t2), 0) + 1
    from_tot = {}
    for (a, _b), n in want_n.items():
        from_tot[a] = from_tot.get(a, 0) + n
    want = {
        k: (n, math.floor(n / from_tot[k[0]] * 1e6 + 0.5) / 1e6)
        for k, n in want_n.items()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(baskets_strategy)
def test_triangle_participation_matches_python_model(spark_sess, rows):
    """Edge orientation + two equi-joins must count each triangle exactly
    once per corner, for arbitrary co-occurrence graphs (support=1 so
    random small baskets still form edges)."""
    from itertools import combinations

    from etl_entregas_pyspark_spark.queries.advanced import triangle_participation

    df = spark_sess.createDataFrame(rows, _BASKET_SCHEMA).repartition(4)
    edges_df = (
        basket_pair_counts(df, "basket", "item")
        .select(F.col("item_a").alias("pa"), F.col("item_b").alias("pb"))
    )
    got = {
        r.part: r.n_triangles for r in triangle_participation(edges_df).collect()
    }

    by_basket = {}
    for b, i in rows:
        by_basket.setdefault(b, set()).add(i)
    edges = set()
    for items in by_basket.values():
        edges.update(combinations(sorted(items), 2))
    want = {}
    for a, b in edges:
        for c in [x for x in {y for e in edges for y in e} if b < x]:
            if (b, c) in edges and (a, c) in edges:
                for n in (a, b, c):
                    want[n] = want.get(n, 0) + 1
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # user
        st.integers(min_value=0, max_value=2000),   # start offset (s)
        st.integers(min_value=1, max_value=400),    # span
    ),
    min_size=1, max_size=60,
))
def test_interval_islands_match_python_model(spark_sess, rows):
    """Running-max island detection must merge overlapping AND touching
    intervals exactly like a sequential sweep, for arbitrary inputs."""
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.window import Window

    schema = StructType([
        StructField("user_id", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("s", LongType(), False),
        StructField("e", LongType(), False),
    ])
    data = [(u, i, s, s + sp) for i, (u, s, sp) in enumerate(rows)]
    iv = spark_sess.createDataFrame(data, schema).repartition(4)

    w_prev = (
        Window.partitionBy("user_id").orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id", "event_id", "s", "e",
        F.when(F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1)
        .otherwise(0).alias("ni"),
    )
    # the running island-number MUST use the SAME total order as the flag
    # window (production q133 does): with variable-length same-start
    # intervals, ordering one window by (s, e) and the other by
    # (s, event_id) mislabels islands — hypothesis found the case
    w_run = (
        Window.partitionBy("user_id").orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        flagged.select("user_id", "s", "e", F.sum("ni").over(w_run).alias("isl"))
        .groupBy("user_id", "isl")
        .agg(F.min("s").alias("a"), F.max("e").alias("b"))
    )
    got = {}
    for r in merged.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum(F.col("b") - F.col("a")).alias("cov")
    ).collect():
        got[r.user_id] = (r.n, r.cov)

    by_user = {}
    for u, i, s, e in data:
        by_user.setdefault(u, []).append((s, e))
    want = {}
    for u, ivs in by_user.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        want[u] = (len(islands), sum(b - a for a, b in islands))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # price
        st.integers(min_value=0, max_value=20),  # size (dups likely)
    ),
    min_size=1, max_size=50,
))
def test_skyline_two_phase_matches_python_model(spark_sess, rows):
    """Local-prune + global-merge skyline must equal the O(n^2) weak-
    dominance definition (exact duplicates keep the lowest key)."""
    from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType

    from etl_entregas_pyspark_spark.queries.relational import _skyline_keep

    schema = StructType([
        StructField("p_partkey", LongType(), False),
        StructField("p_retailprice", DoubleType(), False),
        StructField("p_size", IntegerType(), False),
    ])
    data = [(i, float(p), s) for i, (p, s) in enumerate(rows)]
    df = spark_sess.createDataFrame(data, schema).repartition(4)
    local = _skyline_keep(df.withColumn("_pid", F.spark_partition_id()), ["_pid"]).drop("_pid")
    got = {
        r.p_partkey
        for r in _skyline_keep(local.withColumn("_g", F.lit(0)), ["_g"]).collect()
    }

    def dominated(x, others):
        k, p, s = x
        for k2, p2, s2 in others:
            if k2 == k:
                continue
            if p2 <= p and s2 >= s and (p2 < p or s2 > s or k2 < k):
                return True
        return False

    want = {k for (k, p, s) in data if not dominated((k, p, s), data)}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.sets(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=120))
def test_global_ids_dense_and_ordered(spark_sess, keys):
    """assign_global_ids must produce exactly 1..N in key order for any
    unique key set, whatever boundaries RangePartitioner samples."""
    from pyspark.sql.types import LongType, StructField, StructType

    from etl_entregas_pyspark_spark.queries.relational import assign_global_ids

    schema = StructType([StructField("k", LongType(), False)])
    df = spark_sess.createDataFrame([(k,) for k in keys], schema).repartition(5)
    got = {r.k: r.global_id for r in assign_global_ids(df, "k", n_parts=4).collect()}
    want = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=80),
)
def test_bloom_filter_never_false_negative(spark_sess, members, probes):
    """Every probe key that IS in the member set must pass the Bloom
    pre-filter (false positives allowed, false negatives never)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from etl_entregas_pyspark_spark.queries.relational import _BLOOM_BITS, _bloom_pos

    mschema = StructType([StructField("k", LongType(), False)])
    mem = spark_sess.createDataFrame([(k,) for k in members], mschema)
    pos = mem.select(_bloom_pos(F.col("k"), "a").alias("p")).unionAll(
        mem.select(_bloom_pos(F.col("k"), "b").alias("p"))
    )
    bloom = pos.groupBy((F.col("p") / 32).cast("long").alias("w")).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT)))").alias("bits")
    )
    words = {r.w: r.bits for r in bloom.collect()}

    probe = spark_sess.createDataFrame([(k,) for k in set(probes)], mschema).select(
        "k",
        _bloom_pos(F.col("k"), "a").alias("p1"),
        _bloom_pos(F.col("k"), "b").alias("p2"),
    )
    passed = set()
    for r in probe.collect():
        b1 = words.get(r.p1 // 32, 0)
        b2 = words.get(r.p2 // 32, 0)
        if (b1 >> (r.p1 % 32)) & 1 and (b2 >> (r.p2 % 32)) & 1:
            passed.add(r.k)
    true_members = set(probes) & members
    assert true_members <= passed  # no false negatives, ever


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # group
        st.integers(min_value=0, max_value=8),   # score (coarse: many ties)
        st.integers(min_value=0, max_value=1),   # label
    ),
    min_size=2, max_size=80,
))
def test_auc_rank_matches_pairwise_definition(spark_sess, rows):
    """Rank-sum AUC must equal the O(P*N) pairwise definition
    P(score_pos > score_neg) + 0.5*P(tie) on arbitrary tied data."""
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    from etl_entregas_pyspark_spark.queries.mlmetrics import auc_by_group

    schema = StructType([
        StructField("g", IntegerType(), False),
        StructField("score", DoubleType(), False),
        StructField("y", IntegerType(), False),
    ])
    data = [(g, float(s), y) for g, s, y in rows]
    df = spark_sess.createDataFrame(data, schema).repartition(4)
    got = {r.g: r.auc for r in auc_by_group(df, "g").collect()}

    want = {}
    for g in {g for g, _, _ in data}:
        pos = [s for gg, s, y in data if gg == g and y == 1]
        neg = [s for gg, s, y in data if gg == g and y == 0]
        if not pos or not neg:
            continue
        wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
        want[g] = wins / (len(pos) * len(neg))
    assert set(got) == set(want)
    for g in want:
        assert abs(got[g] - want[g]) < 1e-6 + 1e-9


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # group
        st.integers(min_value=0, max_value=10),  # value (coarse: shared support)
        st.integers(min_value=0, max_value=1),   # sample flag
    ),
    min_size=2, max_size=80,
))
def test_ks_drift_matches_cdf_scan(spark_sess, rows):
    """Integer-exact KS must equal the brute-force max CDF gap over the
    pooled support."""
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    from etl_entregas_pyspark_spark.queries.mlmetrics import ks_by_group

    schema = StructType([
        StructField("g", IntegerType(), False),
        StructField("value", DoubleType(), False),
        StructField("s1", IntegerType(), False),
    ])
    data = [(g, float(v), s) for g, v, s in rows]
    df = spark_sess.createDataFrame(data, schema).repartition(4)
    got = {r.g: (r.n_first, r.n_second, r.ks_stat) for r in ks_by_group(df, "g").collect()}

    want = {}
    for g in {g for g, _, _ in data}:
        a = sorted(v for gg, v, s in data if gg == g and s == 1)
        b = sorted(v for gg, v, s in data if gg == g and s == 0)
        if not a or not b:
            continue
        support = sorted(set(a) | set(b))
        d = max(
            abs(sum(1 for x in a if x <= v) / len(a) - sum(1 for x in b if x <= v) / len(b))
            for v in support
        )
        want[g] = (len(a), len(b), d)
    assert set(got) == set(want)
    for g in want:
        n1, n2, d = want[g]
        assert got[g][0] == n1 and got[g][1] == n2
        assert abs(got[g][2] - d) < 1e-6 + 1e-9


@settings(max_examples=8, deadline=None)
@given(st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=200))
def test_count_min_never_underestimates(spark_sess, tokens):
    """CMS one-sided error: for EVERY key, min-over-rows of the salted
    counters must be >= the true count (and equal when no collision)."""
    from collections import Counter

    from etl_entregas_pyspark_spark.queries.sketches import _CMS_SALTS, _cms_pos

    df = spark_sess.createDataFrame([(t,) for t in tokens], "tok string").repartition(4)
    pos = None
    for i, s in enumerate(_CMS_SALTS):
        b = df.select(F.lit(i).alias("d"), _cms_pos(F.col("tok"), s).alias("p"))
        pos = b if pos is None else pos.unionByName(b)
    cms = {
        (r.d, r.p): r.c
        for r in pos.groupBy("d", "p").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    probe = spark_sess.createDataFrame(
        [(t,) for t in set(tokens)], "tok string"
    ).select(
        "tok", *[_cms_pos(F.col("tok"), s).alias(f"p{i}") for i, s in enumerate(_CMS_SALTS)]
    )
    truth = Counter(tokens)
    for r in probe.collect():
        est = min(cms.get((i, getattr(r, f"p{i}")), 0) for i in range(len(_CMS_SALTS)))
        assert est >= truth[r.tok], (r.tok, est, truth[r.tok])


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
    st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=20),
)
def test_fk_orphan_counts_match_python_model(spark_sess, child_keys, parent_keys):
    """Orphan row/key counts from the collapse-then-probe plan must equal
    the brute-force set difference on arbitrary key multisets."""
    from collections import Counter

    from pyspark.sql.types import LongType, StructField, StructType

    cschema = StructType([StructField("k", LongType(), False)])
    c = (
        spark_sess.createDataFrame([(k,) for k in child_keys], cschema)
        .groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    )
    p = spark_sess.createDataFrame([(k,) for k in parent_keys], cschema).select(
        F.col("k").alias("pk")
    )
    j = c.join(F.broadcast(p), c.k == p.pk, "left")
    row = j.agg(
        F.sum("n").alias("n_rows"),
        F.sum(F.when(F.col("pk").isNull(), F.col("n")).otherwise(0)).alias("n_orphan_rows"),
        F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0)).alias("n_orphan_keys"),
    ).collect()[0]
    truth = Counter(child_keys)
    want_rows = sum(n for k, n in truth.items() if k not in parent_keys)
    want_keys = sum(1 for k in truth if k not in parent_keys)
    assert row.n_rows == len(child_keys)
    assert row.n_orphan_rows == want_rows
    assert row.n_orphan_keys == want_keys


@settings(max_examples=8, deadline=None)
@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # user
        st.integers(min_value=0, max_value=40),       # age in days
        st.integers(min_value=1, max_value=50_000),   # value in cents
    ),
    min_size=1, max_size=60,
))
def test_decay_score_matches_python_model(spark_sess, rows):
    """The integer-day 2^-d decay sum must equal a brute-force model
    using the same quantization (powers of two are exact, so the only
    approximation is the shared floor-1e6 step)."""
    from collections import defaultdict
    from datetime import datetime, timedelta
    import tempfile

    from etl_entregas_pyspark_spark.queries.timeseries import q144_decay_score

    t0 = datetime(2024, 3, 1)
    data = [
        (i, t0 - timedelta(days=age), u, "click", cents / 100.0, "{}")
        for i, (u, age, cents) in enumerate(rows)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark_sess.createDataFrame(
            data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        ).write.parquet(f"{d}/events.parquet")
        got = {r.user_id: (r.n_events, r.decay_score)
               for r in q144_decay_score(spark_sess, d).collect()}

    t_max = max(ts for _, ts, *_ in data)
    acc = defaultdict(lambda: [0, 0])
    import math
    for _, ts, u, _t, v, _p in data:
        dd = min(int((t_max - ts).total_seconds() // 86400), 62)
        acc[u][0] += 1
        acc[u][1] += math.floor(v / (2.0 ** dd) * 1_000_000.0)
    want = {u: (n, s / 1_000_000.0) for u, (n, s) in acc.items()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-9


def test_q161_allocations_sum_exactly_to_order_totals(spark, sf_dir):
    """Largest-remainder exactness: per order, the integer cent
    allocations must reproduce round(o_totalprice*100) EXACTLY — the
    invariant that distinguishes this from naive proportional rounding."""
    import pyspark.sql.functions as F

    from etl_entregas_pyspark_spark.queries.advanced import (
        q161_proportional_allocation,
    )

    alloc = (
        q161_proportional_allocation(spark, sf_dir)
        .groupBy("l_orderkey")
        .agg(F.sum("alloc_cents").alias("got"))
    )
    want = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint").alias("want"),
    )
    bad = alloc.join(want, "l_orderkey").filter(F.col("got") != F.col("want"))
    assert bad.count() == 0
