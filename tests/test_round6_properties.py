"""Property tests for the round-6 operators: model-based checks that pin
the semantic contracts the oracles can only sample."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark_sess(spark):
    # hypothesis forbids function-scoped fixtures; alias the session one
    return spark
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


# ---------------------------------------------------------------------------
# q153 sliding distinct — interval sweep vs a brute-force python model
# ---------------------------------------------------------------------------

_H = 10  # window length in integer "seconds" for the model


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # event_type id
            st.integers(min_value=0, max_value=5),   # user
            st.integers(min_value=0, max_value=40),  # second
        ),
        min_size=1,
        max_size=60,
    )
)
def test_sliding_distinct_sweep_matches_bruteforce(spark_sess, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    schema = StructType(
        [
            StructField("event_id", LongType(), False),
            StructField("event_type", StringType(), False),
            StructField("user_id", LongType(), False),
            StructField("ts", TimestampType(), False),
        ]
    )
    data = [
        (i, f"t{t}", u, base + dt.timedelta(seconds=s))
        for i, (t, u, s) in enumerate(rows)
    ]
    e = spark_sess.createDataFrame(data, schema).repartition(4)

    # the q153 decomposition, with the window shrunk to _H seconds
    from pyspark.sql.window import Window

    from etl_entregas_pyspark_spark.timeutil import epoch_us

    h_us = _H * 1_000_000
    w_next = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    b = e.select(
        "event_id",
        "event_type",
        "ts",
        epoch_us("ts").alias("t_us"),
        F.lead(epoch_us("ts")).over(w_next).alias("next_us"),
    )
    plus = b.select("event_type", F.col("t_us").alias("tm"), F.lit(1).alias("d"))
    minus = b.select(
        "event_type",
        F.least(
            F.coalesce(F.col("next_us"), F.lit(2 ** 62)),
            F.col("t_us") + F.lit(h_us + 1),
        ).alias("tm"),
        F.lit(-1).alias("d"),
    )
    deltas = plus.unionByName(minus).groupBy("event_type", "tm").agg(
        F.sum("d").alias("net")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("tm")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = deltas.select(
        F.col("event_type").alias("c_type"),
        "tm",
        F.sum("net").over(w_cum).cast("bigint").alias("n_active"),
    )
    got = {
        r.event_id: r.n_active
        for r in b.join(
            cum,
            (F.col("event_type") == F.col("c_type")) & (F.col("t_us") == F.col("tm")),
        ).collect()
    }

    # brute force: distinct users of the same type in [s - H, s]
    want = {}
    for i, (t, u, s) in enumerate(rows):
        want[i] = len(
            {u2 for (t2, u2, s2) in rows if t2 == t and s - _H <= s2 <= s}
        )
    assert got == want


# ---------------------------------------------------------------------------
# q152 exact recall — prefix-filtered join vs brute force, in Spark alone
# ---------------------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=6), min_size=1, max_size=9
        ),
        min_size=2,
        max_size=10,
    )
)
def test_prefix_filter_join_has_exact_recall(spark_sess, docsets):
    """Exact recall of the REAL q152 Spark pipeline (setjoin_pairs):
    hypothesis-generated word lists become (doc_id, text) rows, run
    through the actual collapse → prefix → verify → expansion DataFrame
    chain, and the resulting pairs must equal the brute-force all-pairs
    Jaccard join over the same 3-word-shingle sets — including empty-
    shingle docs (< 3 words), identical-text cliques, and cross-group
    inheritance."""
    from etl_entregas_pyspark_spark.queries.setjoin import setjoin_pairs

    tau = 0.5
    texts = [" ".join(str(t) for t in words) for words in docsets]

    def shingles(words):
        return {
            " ".join(str(t) for t in words[k : k + 3])
            for k in range(len(words) - 2)
        }

    sets = {i: shingles(w) for i, w in enumerate(docsets)}
    want = {}
    for i in sets:
        for j in sets:
            if i < j and sets[i] and sets[j]:
                jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
                if jac >= tau:
                    want[(i, j)] = jac

    docs = spark_sess.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard for r in setjoin_pairs(docs, tau).collect()
    }
    assert set(got) == set(want), (set(got) ^ set(want), texts)
    for pair, jac in want.items():
        assert abs(got[pair] - jac) < 5e-5, (pair, got[pair], jac)


# ---------------------------------------------------------------------------
# q163 A-ES sample — exactly min(k, n) per stratum, repartition-stable
# ---------------------------------------------------------------------------


def test_weighted_sample_exactly_k_per_stratum_and_stable(spark, sf_dir):
    from etl_entregas_pyspark_spark.queries.datasplit import (
        _WSN_K,
        q163_weighted_sample_noreplace,
    )

    out = q163_weighted_sample_noreplace(spark, sf_dir)
    sizes = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    pop = {
        r.source: r.n
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter((F.col("n_chars") > 0) & F.col("source").isNotNull())
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for src, n in pop.items():
        assert sizes.get(src, 0) == min(_WSN_K, n)
    # reproducibility: the sample is a pure function of content, so a
    # different physical partitioning must give the identical sample
    a = sorted(map(tuple, out.collect()))
    b = sorted(
        map(
            tuple,
            q163_weighted_sample_noreplace(spark, sf_dir)
            .repartition(7)
            .collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------------------
# q160 keyed overlap join — grain decomposition vs plain theta join
# ---------------------------------------------------------------------------


def test_interval_overlap_matches_theta_join(spark, sf_dir):
    from etl_entregas_pyspark_spark.queries.advanced import (
        q160_interval_overlap_join,
    )
    from etl_entregas_pyspark_spark.queries.events import E
    from etl_entregas_pyspark_spark.timeutil import epoch_us

    got = sorted(
        (r.error_id, r.purchase_id, r.overlap_us)
        for r in q160_interval_overlap_join(spark, sf_dir).collect()
    )
    e = E(spark, sf_dir)
    us = epoch_us("ts")
    err = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        us.alias("a_start"),
        (us + 600_000_000).alias("a_end"),
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        (us - 300_000_000).alias("b_start"),
        (us + 300_000_000).alias("b_end"),
    )
    theta = err.join(
        pur,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("a_start") < F.col("b_end"))
        & (F.col("b_start") < F.col("a_end")),
    ).select(
        "error_id",
        "purchase_id",
        (F.least("a_end", "b_end") - F.greatest("a_start", "b_start"))
        .cast("bigint")
        .alias("overlap_us"),
    )
    want = sorted(
        (r.error_id, r.purchase_id, r.overlap_us) for r in theta.collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# q165 z² — symmetric under arm swap
# ---------------------------------------------------------------------------


def test_ab_test_symmetric_under_arm_swap(spark, sf_dir):
    from etl_entregas_pyspark_spark.queries.mlmetrics import (
        q165_ab_proportion_test,
    )

    base = {r.day: r.z2 for r in q165_ab_proportion_test(spark, sf_dir).collect()}
    # swapping the arms permutes (n_a, x_a) with (n_b, x_b); z² = d²n/(nAnB x nx)
    # is invariant because d flips sign and every other factor is symmetric
    rows = q165_ab_proportion_test(spark, sf_dir).collect()
    for r in rows:
        d = r.x_a * r.n_b - r.x_b * r.n_a
        n, x = r.n_a + r.n_b, r.x_a + r.x_b
        swapped = (
            float(-d) * (-d) / (r.n_b * r.n_a) * n / x / (n - x)
        )
        assert abs(swapped - r.z2) < 1e-4, (r.day, swapped, r.z2)
    assert base


# ---------------------------------------------------------------------------
# q172 clamp identity — prefix - min(0, running min) ≡ the max(0, ·) fold
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=40))
def test_clamp_identity_matches_fold(xs):
    prefix, run_min, s = 0, 0, 0
    for x in xs:
        prefix += x
        run_min = min(run_min, prefix)
        s = max(0, s + x)  # the fold window functions cannot express
        assert prefix - min(0, run_min) == s
