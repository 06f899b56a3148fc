"""Round-9 operators: source JS divergence (q204), join-skew plan (q205),
tokenizer fertility (q206), centroid drift (q207). The DuckDB oracles pin
cross-engine values; these tests pin SEMANTICS against independent
python/numpy recomputes — in particular q204's inner-join-only JS identity
and q207's quantized-centroid arithmetic, which the oracle (being the same
formula) cannot falsify."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np


# ---------------------------------------------------------------------------
# q204 — Jensen-Shannon divergence between per-source unigram distributions
# ---------------------------------------------------------------------------


def _naive_js(docs):
    """Textbook JS over the FULL union vocabulary (log2, one-side terms
    included explicitly) — deliberately NOT the inner-join identity the
    operator uses, so it independently validates that identity."""
    dist: dict[str, Counter] = {}
    for source, text in docs:
        dist.setdefault(source, Counter()).update(text.split(" "))
    out = {}
    sources = sorted(dist)
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            ta, tb = sum(dist[a].values()), sum(dist[b].values())
            js = 0.0
            for w in set(dist[a]) | set(dist[b]):
                p = dist[a][w] / ta
                q = dist[b][w] / tb
                m = (p + q) / 2.0
                if p:
                    js += 0.5 * p * math.log2(p / m)
                if q:
                    js += 0.5 * q * math.log2(q / m)
            out[(a, b)] = js
    return out


def test_source_divergence_matches_naive_js(spark, sf_dir):
    from etl_entregas_pyspark_spark.queries.text import q204_source_divergence

    docs = [
        (r.source, r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    want = _naive_js(docs)
    got = {
        (r.source_a, r.source_b): r.js_divergence
        for r in q204_source_divergence(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for pair, js in want.items():
        # operator quantizes per-token log terms at 1e-12 then rounds to 6:
        # the naive float sum must agree well inside the rounding step
        assert abs(got[pair] - js) < 5e-6, pair
        assert 0.0 <= got[pair] <= 1.0


def test_source_divergence_zero_for_identical_distribution(spark, tmp_path):
    from etl_entregas_pyspark_spark.queries.text import q204_source_divergence

    d = spark.createDataFrame(
        [(i, "the cat sat on the mat", "en", src, 22)
         for i in range(4) for src in ("a", "b")],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = q204_source_divergence(spark, str(tmp_path)).collect()
    assert len(rows) == 1 and rows[0].js_divergence == 0.0


# ---------------------------------------------------------------------------
# q205 — join-skew plan
# ---------------------------------------------------------------------------


def test_join_skew_plan_matches_pandas(spark, sf_dir):
    from etl_entregas_pyspark_spark.queries.advanced import (
        _SKEW_TARGET_ROWS,
        _SKEW_TOPK,
        q205_join_skew_plan,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    cnt = ev.groupby("user_id").size()
    contrib = (cnt * cnt).sort_index()
    total = int(contrib.sum())
    hhi = float((contrib.astype(float) ** 2).sum()) / (total * total)
    want = sorted(
        ((int(c2), int(uid)) for uid, c2 in contrib.items()),
        key=lambda t: (-t[0], t[1]),
    )[:_SKEW_TOPK]

    got = q205_join_skew_plan(spark, sf_dir).collect()
    assert [(r.pair_rows, r.user_id) for r in got] == want
    for r in got:
        assert r.total_pair_rows == total
        assert r.salt_factor == math.ceil(r.pair_rows / _SKEW_TARGET_ROWS)
        assert abs(r.hhi - hhi) < 2e-6
        assert r.n_rows * r.n_rows == r.pair_rows


# ---------------------------------------------------------------------------
# q206 — tokenizer fertility
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_matches_re(spark, sf_dir):
    from etl_entregas_pyspark_spark.queries.text import (
        _FERT_PAT,
        q206_tokenizer_fertility,
    )

    pat = re.compile(_FERT_PAT)
    agg: dict[str, list[int]] = {}
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        a = agg.setdefault(r.lang, [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(r.text)
        a[2] += len(r.text.split(" "))
        a[3] += len(pat.findall(r.text))
    got = {r.lang: r for r in q206_tokenizer_fertility(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for lang, (n, chars, ws, sub) in agg.items():
        r = got[lang]
        assert (r.n_docs, r.total_chars, r.total_ws_tokens, r.total_sub_tokens) == (
            n, chars, ws, sub,
        )
        assert abs(r.chars_per_token - chars / sub) < 1e-4
        assert abs(r.fertility - sub / ws) < 1e-4


# ---------------------------------------------------------------------------
# q207 — centroid drift
# ---------------------------------------------------------------------------


def _quantized_centroid(vectors: np.ndarray) -> np.ndarray:
    q = np.floor(vectors.astype(np.float64) * 1e7)
    return q.sum(axis=0) / len(q) / 1e7


def test_centroid_drift_matches_numpy(spark, sf_dir):
    from etl_entregas_pyspark_spark.queries.similarity import q207_centroid_drift

    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    by_key: dict[tuple[int, int], list] = {}
    for r in rows:
        by_key.setdefault((r.label, r.vec_id % 2), []).append(r.embedding)
    got = {r.label: r for r in q207_centroid_drift(spark, sf_dir).collect()}
    labels = sorted({l for l, _ in by_key} & {l for l, s in by_key if s == 1})
    for label in labels:
        if (label, 0) not in by_key or (label, 1) not in by_key:
            continue
        a = np.array(by_key[(label, 0)])
        b = np.array(by_key[(label, 1)])
        diff = _quantized_centroid(a) - _quantized_centroid(b)
        # mirror the operator's 1e-12 quantized accumulation of diff²
        d2 = float(np.sum(np.floor(diff * diff * 1e12))) / 1e12
        r = got[label]
        assert (r.n_snap_a, r.n_snap_b) == (len(a), len(b))
        assert abs(r.drift_l2 - math.sqrt(d2)) < 2e-6
        assert abs(r.max_dim_shift - np.abs(diff).max()) < 2e-6
        # L∞ ≤ L2 always — a cheap structural invariant of the output
        assert r.max_dim_shift <= r.drift_l2 + 1e-9


def test_centroid_drift_zero_for_identical_snapshots(spark, tmp_path):
    from etl_entregas_pyspark_spark.queries.similarity import q207_centroid_drift

    vec = [0.25, -1.5, 3.0]
    df = spark.createDataFrame(
        [(i, vec, 7) for i in range(6)],
        "vec_id long, embedding array<float>, label int",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    rows = q207_centroid_drift(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].drift_l2 == 0.0 and rows[0].max_dim_shift == 0.0


# ---------------------------------------------------------------------------
# q199/q200 — the derived-K rule (r8 verdict #4's done-criterion: pin
# derived_k == ceil(sqrt(n)) at TWO scale points + fixed-K equality)
# ---------------------------------------------------------------------------


def test_derived_k_equals_ceil_sqrt_n_at_two_scale_points(spark):
    from etl_entregas_pyspark_spark.queries.similarity import (
        q199_semdedup_auto,
        q200_label_noise_auto,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        n = spark.read.parquet(f"{sf}/embeddings.parquet").count()
        want_k = math.ceil(math.sqrt(n))
        rows = q199_semdedup_auto(spark, sf).collect()
        assert rows, sf
        assert {r.derived_k for r in rows} == {want_k}, sf
        noise = q200_label_noise_auto(spark, sf).collect()
        # flagged set may legitimately be empty at tiny scale; when rows
        # exist, every one must carry the same derived K
        assert {r.derived_k for r in noise} <= {want_k}, sf


def test_auto_forms_equal_fixed_k_kernels_at_derived_k(spark, sf_dir):
    """q199/q200 must be EXACTLY the fixed-K kernels evaluated at
    K = ceil(sqrt(n)) — the derivation changes where K comes from,
    never the arithmetic downstream of it."""
    from etl_entregas_pyspark_spark.queries.similarity import (
        label_noise_flags,
        q199_semdedup_auto,
        q200_label_noise_auto,
        semdedup_prune,
    )

    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    k = math.ceil(math.sqrt(n))

    want = {
        tuple(r) for r in semdedup_prune(spark, sf_dir, n_centroids=k).collect()
    }
    got = {
        tuple(r)[:-1]  # strip derived_k
        for r in q199_semdedup_auto(spark, sf_dir).collect()
    }
    assert got == want

    want_noise = {
        tuple(r) for r in label_noise_flags(spark, sf_dir, n_centroids=k).collect()
    }
    got_noise = {
        tuple(r)[:-1] for r in q200_label_noise_auto(spark, sf_dir).collect()
    }
    assert got_noise == want_noise


# ---------------------------------------------------------------------------
# q208 — PPS sample + Horvitz-Thompson audit
# ---------------------------------------------------------------------------


def test_pps_sample_audit_matches_hashlib_recompute(spark, sf_dir):
    import hashlib

    from etl_entregas_pyspark_spark.queries.datasplit import (
        _PPS_FRAC,
        q208_pps_sample_audit,
    )

    rows = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n_corpus = len(rows)
    total_chars = sum(r.n_chars for r in rows)
    m = math.ceil(_PPS_FRAC * n_corpus)
    agg: dict[str, list] = {}
    for r in rows:
        pi = min(1.0, m * float(r.n_chars) / total_chars)
        u = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16) / float(1 << 60)
        toks = len(r.text.split(" "))
        a = agg.setdefault(r.source, [0, 0, 0, 0])  # docs, sampled, exact, ht_q
        a[0] += 1
        a[2] += toks
        if u < pi:
            a[1] += 1
            a[3] += math.floor(toks / pi * 10000.0)
    got = {r.source: r for r in q208_pps_sample_audit(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for src, (n, ns, exact, htq) in agg.items():
        r = got[src]
        ht = htq / 10000.0
        assert (r.n_docs, r.n_sampled, r.exact_tokens) == (n, ns, exact)
        assert abs(r.ht_estimate - ht) < 0.02
        assert abs(r.rel_err_pct - 100.0 * (ht - exact) / exact) < 1e-3
        assert 0 <= ns <= n
    # the sampler must neither degenerate to empty nor take everything
    total_sampled = sum(a[1] for a in agg.values())
    total_docs = sum(a[0] for a in agg.values())
    assert 0 < total_sampled < total_docs


def test_pps_always_includes_certain_docs(spark, tmp_path):
    """A document so large that pi=1 is sampled with weight 1: its tokens
    enter the HT sum exactly."""
    from etl_entregas_pyspark_spark.queries.datasplit import q208_pps_sample_audit

    rows = [(1, "a b c d e f g h", "big", 100000)] + [
        (i, "x y", "small", 1) for i in range(2, 30)
    ]
    df = spark.createDataFrame(
        [(d, t, "en", s, c) for (d, t, s, c) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r.source: r for r in q208_pps_sample_audit(spark, str(tmp_path)).collect()}
    big = got["big"]
    assert big.n_sampled == 1 and big.ht_estimate == float(big.exact_tokens)
    assert big.rel_err_pct == 0.0


# ---------------------------------------------------------------------------
# q209 — Zipf slope
# ---------------------------------------------------------------------------


def test_zipf_slope_matches_numpy_ols(spark, sf_dir):
    from etl_entregas_pyspark_spark.queries.text import _ZIPF_TOP, q209_zipf_slope

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cnt: dict[str, Counter] = {}
    for r in docs:
        cnt.setdefault(r.source, Counter()).update(r.text.split(" "))
    got = {r.source: r for r in q209_zipf_slope(spark, sf_dir).collect()}
    assert set(got) == set(cnt)
    for src, c in cnt.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_TOP]
        qx = [math.floor(math.log(i + 1) * 1e6) for i in range(len(ranked))]
        qy = [math.floor(math.log(v) * 1e6) for _, v in ranked]
        qxy = [
            math.floor(math.log(i + 1) * math.log(v) * 1e6)
            for i, (_, v) in enumerate(ranked)
        ]
        qxx = [math.floor(math.log(i + 1) ** 2 * 1e6) for i in range(len(ranked))]
        n = len(ranked)
        sx, sy, sxy, sxx = (sum(q) / 1e6 for q in (qx, qy, qxy, qxx))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r = got[src]
        assert r.n_ranks == n
        assert abs(r.zipf_slope - slope) < 2e-4, src


def test_zipf_slope_recovers_planted_power_law(spark, tmp_path):
    """A corpus whose token frequencies follow c(r) = floor(3000/r) must
    fit a slope close to -1 (the floor bends the tail slightly)."""
    from etl_entregas_pyspark_spark.queries.text import q209_zipf_slope

    words = []
    for r in range(1, 51):
        words.extend([f"w{r:04d}"] * (3000 // r))
    docs = []
    chunk = 200
    for i in range(0, len(words), chunk):
        docs.append((i, " ".join(words[i : i + chunk]), "en", "planted", 1))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = q209_zipf_slope(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert abs(rows[0].zipf_slope - (-1.0)) < 0.05
