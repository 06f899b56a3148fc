"""Round-8 operators: K-scaled label noise (q197) and density-adaptive
triangle support (q198). The DuckDB oracles pin cross-engine values;
these tests pin SEMANTICS against independent numpy recomputes and the
cross-K / cross-threshold invariants the oracles can't see."""

from __future__ import annotations

from collections import Counter

import numpy as np


# ---------------------------------------------------------------------------
# q197 — label noise at the production centroid count
# ---------------------------------------------------------------------------


def _numpy_label_noise(rows, n_centroids: int, k: int):
    """Independent recompute of the q191/q197 kernel: nearest-of-K
    centroid assignment (lower-id tie-break), within-bucket kNN by exact
    cosine (ties to lower id), majority vote (ties to lower label).
    Returns ({vec_id: (label, predicted, votes)}, {vec_id: knn_id_list})."""
    ids = np.array([r.vec_id for r in rows])
    emb = np.array([r.embedding for r in rows], dtype=np.float64)
    labels = {r.vec_id: r.label for r in rows}
    cents = emb[ids < n_centroids]
    d2 = ((emb[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    norms = np.sqrt((emb * emb).sum(axis=1))
    flagged, knn_lists = {}, {}
    for c in np.unique(assign):
        idx = np.where(assign == c)[0]
        members = ids[idx]
        sub = emb[idx]
        sub_n = norms[idx]
        # per-pair vector dots (not one matmul): matches the arithmetic
        # the q191 numpy reference validated against Spark's fold
        for i, vid in enumerate(int(v) for v in members):
            scored = sorted(
                (-(sub[i] @ sub[j]) / (sub_n[i] * sub_n[j]), int(members[j]))
                for j in range(len(members))
                if j != i
            )
            top = scored[:k]
            knn_lists[vid] = [nid for _, nid in top]
            if not top:
                continue
            votes = Counter(labels[nid] for _, nid in top)
            pred = min(votes, key=lambda l: (-votes[l], l))
            if pred != labels[vid]:
                flagged[vid] = (labels[vid], pred, votes[pred])
    return flagged, knn_lists


def test_scaled_label_noise_matches_numpy_reference(spark, sf_dir):
    """q197 must reproduce the exact flagged set of the K=32 kernel —
    same recompute as q191's test, with the centroid cutoff turned."""
    from etl_entregas_pyspark_spark.queries.similarity import (
        _NOISE_K,
        _SEMDEDUP_K,
        q197_label_noise_scaled,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    want, _ = _numpy_label_noise(rows, _SEMDEDUP_K, _NOISE_K)
    got = {
        r.vec_id: (r.label, r.predicted_label, r.n_votes)
        for r in q197_label_noise_scaled(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_label_noise_flag_invariance_under_finer_clustering(
    spark, oracle_sf_dir
):
    """The drop-set-stability contract: a vector whose 10-NN neighbor
    LIST is unchanged by the finer clustering must keep its verdict
    bit-for-bit — K only changes outcomes through bucket-boundary
    reassignment, never through the vote math itself. Also pins that
    the two registered forms (q191/q197) match their kernels' flag
    sets, so the invariance statement transfers to the Spark plans.
    Runs at sf0.01 — the sf0.001 fixture's ~50 vectors over 32 buckets
    leave no neighbor list unchanged, which degenerates the claim."""
    sf_dir = oracle_sf_dir
    from etl_entregas_pyspark_spark.queries.similarity import (
        _NOISE_K,
        _SEMDEDUP_K,
        q191_label_noise,
        q197_label_noise_scaled,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    f8, knn8 = _numpy_label_noise(rows, 8, _NOISE_K)
    f32, knn32 = _numpy_label_noise(rows, _SEMDEDUP_K, _NOISE_K)
    unchanged = [v for v in knn8 if knn8[v] == knn32.get(v)]
    assert unchanged, "fixture degenerate: every neighbor list changed"
    for v in unchanged:
        assert (f8.get(v) is None) == (f32.get(v) is None)
        if v in f8:
            assert f8[v] == f32[v]
    got8 = {
        r.vec_id: (r.label, r.predicted_label, r.n_votes)
        for r in q191_label_noise(spark, sf_dir).collect()
    }
    got32 = {
        r.vec_id: (r.label, r.predicted_label, r.n_votes)
        for r in q197_label_noise_scaled(spark, sf_dir).collect()
    }
    assert got8 == f8 and got32 == f32


# ---------------------------------------------------------------------------
# q198 — density-adaptive triangle support
# ---------------------------------------------------------------------------


def test_adaptive_support_reproduces_q126_at_baseline_density(
    spark, oracle_sf_dir
):
    """At baseline density the pair-count median is 1, so the derived
    support collapses to q126's fixed 2 and the triangle output must be
    IDENTICAL (modulo the audit column). Pins the q194-pattern claim
    that adaptivity is a pure scale guard, not a semantic fork."""
    from etl_entregas_pyspark_spark.queries.advanced import (
        _TRI_SUPPORT,
        q126_copurchase_triangles,
        q198_triangles_adaptive_support,
    )

    fixed = [
        (r.part, r.n_triangles)
        for r in q126_copurchase_triangles(spark, oracle_sf_dir).collect()
    ]
    adaptive_rows = q198_triangles_adaptive_support(
        spark, oracle_sf_dir
    ).collect()
    assert all(r.derived_support == _TRI_SUPPORT for r in adaptive_rows)
    adaptive = [(r.part, r.n_triangles) for r in adaptive_rows]
    assert adaptive == fixed and len(fixed) > 0


def test_adaptive_support_scales_with_planted_density(spark):
    """Replicating every lineitem row's basket membership K times under
    DISTINCT order keys multiplies every pair count by K; the derived
    support must follow the median (2×K·median) and reproduce the same
    edge set the baseline run used — the measured SCALE.md law as an
    executable assertion, on a synthetic corpus small enough for CI."""
    import tempfile

    from pyspark.sql import functions as F

    from etl_entregas_pyspark_spark.queries.advanced import (
        q198_triangles_adaptive_support,
    )

    base = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
    )
    with tempfile.TemporaryDirectory() as d:
        base.write.parquet(f"{d}/base/lineitem.parquet")
        dense = base.crossJoin(
            spark.range(4).select(F.col("id").alias("__rep__"))
        ).select(
            (F.col("l_orderkey") * 10 + F.col("__rep__")).alias("l_orderkey"),
            "l_partkey",
        )
        dense.write.parquet(f"{d}/dense/lineitem.parquet")
        lo = q198_triangles_adaptive_support(spark, f"{d}/base").collect()
        hi = q198_triangles_adaptive_support(spark, f"{d}/dense").collect()
        sup_lo = lo[0].derived_support if lo else 2
        sup_hi = hi[0].derived_support if hi else None
        assert hi, "dense run produced no triangles"
        # 4x replication multiplies every pair count by 4, so the
        # median quadruples and the derived valve follows it exactly
        assert sup_hi == 4 * sup_lo
        # with the valve scaled, the surviving edge set — and hence the
        # triangle counts — are invariant under uniform densification
        assert [(r.part, r.n_triangles) for r in hi] == [
            (r.part, r.n_triangles) for r in lo
        ]
