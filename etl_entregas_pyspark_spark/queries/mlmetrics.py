"""ML evaluation / feature-audit operators: rank-based AUC, two-sample
Kolmogorov-Smirnov drift, and information-gain split scoring.

The reference pipeline (reference `src/etl_entregas.py:537-553`) has no ML
surface at all; these extend the engine toward the model-evaluation and
feature-selection passes a training-data platform runs next to its ETL.
Shared design rule: compress to per-(group, value) counts FIRST, so every
window below runs over the compressed distinct-value domain, partitioned
by the group key — never a global single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_entregas_pyspark_spark.queries.registry import register
from etl_entregas_pyspark_spark.queries.relational import T, rnd, _rnd_sql
from etl_entregas_pyspark_spark.queries.events import E


def auc_by_group(pts: DataFrame, group: str = "lang") -> DataFrame:
    """(group, n_pos, n_neg, auc) from rows (group, score: double, y: 0/1).

    Tie-aware Mann-Whitney: compress to per-(group, score) counts, rank
    the distinct scores with a group-partitioned window (doubled ranks
    stay integer through ties), then one exact-integer identity with a
    single final fp division. Groups with only one class are dropped
    (AUC undefined)."""
    per_score = pts.groupBy(group, "score").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    w_before = (
        Window.partitionBy(group)
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_score.select(
        group,
        "cnt",
        "pos",
        (2 * F.coalesce(F.sum("cnt").over(w_before), F.lit(0)) + F.col("cnt") + 1).alias(
            "r2"
        ),
    )
    agg = ranked.groupBy(group).agg(
        F.sum(F.col("pos") * F.col("r2")).cast("bigint").alias("s2"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast("bigint").alias("n_neg"),
    )
    auc = (F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1)) / (
        2 * F.col("n_pos") * F.col("n_neg")
    ).cast("double")
    return agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0)).select(
        group, "n_pos", "n_neg", rnd(auc, 6).alias("auc")
    )


def ks_by_group(pts: DataFrame, group: str = "event_type") -> DataFrame:
    """(group, n_first, n_second, ks_stat) from rows (group, value: double,
    s1: 0/1) where s1 marks sample-1 membership (else sample 2).

    D = max_v |F1(v) - F2(v)| over the pooled support, in exact integers
    (max |cum1*n2 - cum2*n1|, one final division). Groups with an empty
    sample are dropped. NULL values are dropped up front: Spark's window
    sort puts NULLs first while DuckDB's puts them last, so a NULL in the
    support would shift the two engines' cumulative CDFs differently —
    and a KS statistic over an unordered point is meaningless anyway."""
    pts = pts.filter(F.col("value").isNotNull())
    cells = pts.groupBy(group, "value").agg(
        F.sum("s1").cast("bigint").alias("c1"),
        F.sum(1 - F.col("s1")).cast("bigint").alias("c2"),
    )
    w_cum = (
        Window.partitionBy(group)
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group)
    cum = cells.select(
        group,
        F.sum("c1").over(w_cum).cast("bigint").alias("cum1"),
        F.sum("c2").over(w_cum).cast("bigint").alias("cum2"),
        F.sum("c1").over(w_all).cast("bigint").alias("n1"),
        F.sum("c2").over(w_all).cast("bigint").alias("n2"),
    )
    agg = cum.groupBy(group).agg(
        F.first("n1").alias("n_first"),
        F.first("n2").alias("n_second"),
        F.max(F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))).alias(
            "_dmax"
        ),
    )
    ks = F.col("_dmax").cast("double") / (F.col("n_first") * F.col("n_second"))
    return agg.filter((F.col("n_first") > 0) & (F.col("n_second") > 0)).select(
        group, "n_first", "n_second", rnd(ks, 6).alias("ks_stat")
    )


# ---------------------------------------------------------------------------
# q138 — ROC AUC via the Mann-Whitney rank-sum (tie-aware, integer-exact)
# ---------------------------------------------------------------------------


@register(
    "q138_auc_rank",
    f"""
    WITH pts AS (
        SELECT d.lang,
               CAST(e.embedding[1] AS DOUBLE) AS score,
               e.label % 2 AS y
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    ), per_score AS (
        SELECT lang, score,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM pts GROUP BY lang, score
    ), ranked AS (
        SELECT lang, cnt, pos,
               2 * COALESCE(SUM(cnt) OVER (
                       PARTITION BY lang ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + cnt + 1 AS r2
        FROM per_score
    ), agg AS (
        SELECT lang,
               CAST(SUM(pos * r2) AS BIGINT) AS s2,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(cnt - pos) AS BIGINT) AS n_neg
        FROM ranked GROUP BY lang
    )
    SELECT lang, n_pos, n_neg,
           {_rnd_sql("(s2 - n_pos * (n_pos + 1)) / CAST(2 * n_pos * n_neg AS DOUBLE)", 6)} AS auc
    FROM agg WHERE n_pos > 0 AND n_neg > 0
    """,
    doc="per-group ROC AUC from the Mann-Whitney rank-sum: score = first "
    "embedding dim, label = parity of the class id, groups = document "
    "language. Tie-aware average ranks are kept INTEGER by doubling "
    "(r2 = 2*rank_before + cnt + 1), so AUC = (S2 - P(P+1)) / (2PN) is "
    "one exact-integer expression with a single fp division at the end — "
    "bitwise across engines, no per-pair comparison (the naive O(P*N) "
    "self-join). Plan: compress to per-(lang, score) counts first, so "
    "the rank window runs over the distinct-score domain partitioned by "
    "lang. For one GLOBAL AUC at 100 TB (no partition key), swap the "
    "window for the q131 value-bucket prefix-sum: bucket scores, "
    "per-bucket counts, broadcast cumulative offsets — same rank "
    "arithmetic, no single-partition sort. Range bound: S2 <= N*(2N+1) "
    "per group, so bigint holds to ~2e9 rows per group; past that, lift "
    "s2/r2 to decimal(38,0) — the identity is unchanged.",
)
def q138_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    d = T(spark, sf_dir, "documents").select("doc_id", "lang")
    pts = e.join(d, e.vec_id == d.doc_id).select(
        "lang",
        F.element_at("embedding", 1).cast("double").alias("score"),
        (F.col("label") % 2).alias("y"),
    )
    return auc_by_group(pts, "lang")


# ---------------------------------------------------------------------------
# q139 — two-sample Kolmogorov-Smirnov drift (numeric twin of q136)
# ---------------------------------------------------------------------------


@register(
    "q139_ks_drift",
    f"""
    WITH cells AS (
        SELECT event_type, value,
               CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN EXTRACT(day FROM ts) > 15 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM events WHERE value IS NOT NULL GROUP BY event_type, value
    ), cum AS (
        SELECT event_type,
               CAST(SUM(c1) OVER w AS BIGINT) AS cum1,
               CAST(SUM(c2) OVER w AS BIGINT) AS cum2,
               CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
               CAST(SUM(c2) OVER (PARTITION BY event_type) AS BIGINT) AS n2
        FROM cells
        WINDOW w AS (PARTITION BY event_type ORDER BY value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, ANY_VALUE(n1) AS n_first, ANY_VALUE(n2) AS n_second,
           {_rnd_sql("CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS DOUBLE)"
                     " / (ANY_VALUE(n1) * ANY_VALUE(n2))", 6)} AS ks_stat
    FROM cum
    GROUP BY event_type
    HAVING ANY_VALUE(n1) > 0 AND ANY_VALUE(n2) > 0
    """,
    doc="two-sample Kolmogorov-Smirnov statistic per event type: the "
    "NUMERIC drift monitor beside q136's categorical chi-square — does "
    "the `value` distribution shift between month halves? D = "
    "max_v |F1(v) - F2(v)| over the pooled support, computed as "
    "max |cum1*n2 - cum2*n1| in exact integers with ONE final division "
    "(empirical CDFs never materialize as doubles, so no accumulated fp "
    "drift and no cross-engine sum-order hazard). Plan: compress to "
    "per-(type, value) counts, then one cumulative window over the "
    "distinct-value domain partitioned by event_type — the same single "
    "exchange serves the per-type totals and the final max. Range "
    "bound: |cum*n| <= n1*n2 per type, bigint-safe to ~3e9 rows per "
    "side; past that, lift the products to decimal(38,0).",
)
def q139_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = E(spark, sf_dir)
    pts = e.select(
        "event_type",
        "value",
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("s1"),
    )
    return ks_by_group(pts, "event_type")


# ---------------------------------------------------------------------------
# q140 — information-gain split scoring (decision-tree feature audit)
# ---------------------------------------------------------------------------

# 0·log2(0) := 0 convention, via exact counts: H-contribution of a count c
# within a node of size n is c*log2(c), guarded for c = 0.
_CLOG_SQL = "(CASE WHEN {c} > 0 THEN {c} * LOG2(CAST({c} AS DOUBLE)) ELSE 0 END)"


@register(
    "q140_split_gain",
    f"""
    WITH base AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               o_orderpriority AS priority,
               CAST(EXTRACT(month FROM o_orderdate) AS VARCHAR) AS mon,
               c_mktsegment AS segment
        FROM orders JOIN customer ON o_custkey = c_custkey
    ), long AS (
        SELECT feature, value, y FROM (
            SELECT 'priority' AS feature, priority AS value, y FROM base
            UNION ALL
            SELECT 'month', mon, y FROM base
            UNION ALL
            SELECT 'segment', segment, y FROM base
        )
    ), cells AS (
        SELECT feature, value,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM long GROUP BY feature, value
    ), per_feature AS (
        SELECT feature,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(n) AS BIGINT) AS total,
               CAST(SUM(pos) AS BIGINT) AS total_pos,
               CAST(SUM(CAST(FLOOR(({_CLOG_SQL.format(c="n")}
                   - {_CLOG_SQL.format(c="pos")}
                   - {_CLOG_SQL.format(c="(n - pos)")}) * 10000.0) AS BIGINT)) AS DOUBLE)
                   / 10000.0 AS child_bits
        FROM cells GROUP BY feature
    )
    SELECT feature, n_values,
           {_rnd_sql(
               "(" + _CLOG_SQL.format(c="total") + " - " + _CLOG_SQL.format(c="total_pos")
               + " - " + _CLOG_SQL.format(c="(total - total_pos)") + ") / total", 6)} AS parent_entropy,
           {_rnd_sql("child_bits / total", 6)} AS child_entropy,
           {_rnd_sql(
               "(" + _CLOG_SQL.format(c="total") + " - " + _CLOG_SQL.format(c="total_pos")
               + " - " + _CLOG_SQL.format(c="(total - total_pos)") + ") / total"
               " - child_bits / total", 6)} AS gain
    FROM per_feature
    """,
    doc="information-gain split audit: score each candidate categorical "
    "feature (order priority, order month, customer segment) by how many "
    "bits it buys predicting the binary label o_orderstatus = 'F' — the "
    "scoring loop of a distributed decision-tree / feature-selection "
    "pass. Entropies come from EXACT integer counts via the identity "
    "n*H = n*log2(n) - pos*log2(pos) - neg*log2(neg) (0*log2(0) := 0), "
    "so each output is a short fixed-order expression over bigints with "
    "fp only in the final log2/divide, rounded 6dp. Plan: one stack-"
    "unpivot (no join between features), per-(feature, value) partial "
    "counts collapse in the scan stage, then a per-feature rollup — two "
    "constant-width exchanges; the customer dim joins broadcast.",
)
def q140_split_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        F.col("o_orderpriority").alias("priority"),
        F.month("o_orderdate").cast("string").alias("mon"),
        F.col("c_mktsegment").alias("segment"),
    )
    long = base.select(
        F.expr(
            "stack(3, 'priority', priority, 'month', mon, 'segment', segment)"
        ).alias("feature", "value"),
        "y",
    )
    cells = long.groupBy("feature", "value").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )

    def clog(col):
        return F.when(col > 0, col * F.log2(col.cast("double"))).otherwise(F.lit(0.0))

    per_feature = cells.groupBy("feature").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.sum("n").cast("bigint").alias("total"),
        F.sum("pos").cast("bigint").alias("total_pos"),
        # per-cell contributions are doubles; quantize to fixed point before
        # the sum so the total is order-independent across partitionings and
        # engines (dsum pattern — see relational.dsum)
        (
            F.sum(
                F.floor(
                    (
                        clog(F.col("n"))
                        - clog(F.col("pos"))
                        - clog(F.col("n") - F.col("pos"))
                    )
                    * 10000.0
                ).cast("long")
            ).cast("double")
            / 10000.0
        ).alias("child_bits"),
    )
    parent_bits = (
        clog(F.col("total"))
        - clog(F.col("total_pos"))
        - clog(F.col("total") - F.col("total_pos"))
    )
    return per_feature.select(
        "feature",
        "n_values",
        rnd(parent_bits / F.col("total"), 6).alias("parent_entropy"),
        rnd(F.col("child_bits") / F.col("total"), 6).alias("child_entropy"),
        rnd(parent_bits / F.col("total") - F.col("child_bits") / F.col("total"), 6).alias(
            "gain"
        ),
    )


# ---------------------------------------------------------------------------
# q154 — calibration (reliability) bins for a scored classifier
# ---------------------------------------------------------------------------

_CAL_BINS = 10


@register(
    "q154_calibration_bins",
    f"""
    WITH pts AS (
        SELECT CAST(e.embedding[1] AS DOUBLE) AS score, e.label % 2 AS y
        FROM embeddings e
    ), ext AS (
        SELECT MIN(score) AS lo, MAX(score) AS hi FROM pts
    ), binned AS (
        SELECT LEAST(CAST(FLOOR((score - lo) / (hi - lo) * {_CAL_BINS}) AS BIGINT),
                     {_CAL_BINS - 1}) AS bin,
               score, y
        FROM pts, ext
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           {_rnd_sql("CAST(SUM(CAST(FLOOR(score * 1000000.0) AS BIGINT)) AS DOUBLE)"
                     " / 1000000.0 / COUNT(*)", 6)} AS mean_score,
           {_rnd_sql("CAST(SUM(y) AS DOUBLE) / COUNT(*)", 6)} AS frac_pos
    FROM binned GROUP BY bin
    """,
    doc="reliability-diagram bins: the calibration companion to q138's "
    "AUC — equal-width score bins over the observed [min, max], each "
    "reporting its population, quantized mean score, and positive rate; "
    "a calibrated scorer has mean_score tracking frac_pos per bin. The "
    "(lo, hi) extent is ONE scalar aggregate broadcast back over the "
    "scan (windowless q99 pattern), bin assignment is a single "
    "fixed-order fp expression identical in both engines, and the mean "
    "is a dsum-quantized integer sum with one final division — no "
    "accumulation-order hazard. Plan: two passes over the scored "
    "column, both whole-stage-codegen, one 10-row exchange.",
)
def q154_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    pts = e.select(
        F.element_at("embedding", 1).cast("double").alias("score"),
        (F.col("label") % 2).alias("y"),
    )
    ext = pts.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    binned = pts.crossJoin(F.broadcast(ext)).select(
        F.least(
            F.floor(
                (F.col("score") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * _CAL_BINS
            ).cast("bigint"),
            F.lit(_CAL_BINS - 1),
        ).alias("bin"),
        "score",
        "y",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        rnd(
            F.sum(F.floor(F.col("score") * 1000000.0).cast("bigint")).cast("double")
            / 1000000.0
            / F.count(F.lit(1)),
            6,
        ).alias("mean_score"),
        rnd(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias("frac_pos"),
    )


# ---------------------------------------------------------------------------
# q155 — PSI (population stability index) feature-drift monitor
# ---------------------------------------------------------------------------

_PSI_BINS = 10
# additive smoothing keeps empty bins finite (the standard 0.5 pseudo-count)
_PSI_TERM = (
    "((c1 + 0.5) / (n1 + {b} * 0.5) - (c2 + 0.5) / (n2 + {b} * 0.5))"
    " * LN(((c1 + 0.5) / (n1 + {b} * 0.5)) / ((c2 + 0.5) / (n2 + {b} * 0.5)))"
).format(b=_PSI_BINS)


@register(
    "q155_psi_drift",
    f"""
    WITH pts AS (
        SELECT event_type, value,
               CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 1 ELSE 0 END AS s1
        FROM events WHERE value IS NOT NULL
    ), ext AS (
        SELECT event_type AS e_type, MIN(value) AS lo, MAX(value) AS hi
        FROM pts WHERE s1 = 1 GROUP BY event_type
    ), binned AS (
        SELECT p.event_type,
               LEAST(GREATEST(CAST(FLOOR((p.value - x.lo) / (x.hi - x.lo)
                                          * {_PSI_BINS}) AS BIGINT), 0),
                     {_PSI_BINS - 1}) AS bin,
               p.s1
        FROM pts p JOIN ext x ON p.event_type = x.e_type
    ), cells AS (
        SELECT event_type, bin,
               CAST(SUM(s1) AS BIGINT) AS c1,
               CAST(SUM(1 - s1) AS BIGINT) AS c2
        FROM binned GROUP BY event_type, bin
    ), tot AS (
        SELECT event_type, bin, c1, c2,
               SUM(c1) OVER (PARTITION BY event_type) AS n1,
               SUM(c2) OVER (PARTITION BY event_type) AS n2
        FROM cells
    )
    SELECT event_type,
           CAST(ANY_VALUE(n1) AS BIGINT) AS n_ref,
           CAST(ANY_VALUE(n2) AS BIGINT) AS n_cur,
           {_rnd_sql("CAST(SUM(CAST(FLOOR((" + _PSI_TERM + ") * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0", 5)} AS psi
    FROM tot GROUP BY event_type
    """,
    doc="population stability index per event type: the industry-standard "
    "score-drift monitor beside q136 (chi-square, categorical) and q139 "
    "(KS, max CDF gap) — PSI = sum (p_i - q_i) ln(p_i / q_i) over 10 "
    "equal-width bins of the REFERENCE (first month-half) extent, 0.5 "
    "pseudo-count smoothing so empty bins stay finite, current-half "
    "values clamped into the edge bins. Bin edges come from one "
    "per-type min/max aggregate (broadcast join — with 5 types the "
    "whole extent table is bytes); each PSI term is a fixed-order "
    "double expression quantized floor-1e-6 before the integer sum, so "
    "the aggregate is partition-order-independent and engine-identical "
    "(same libm ln on this host, the q140/q141 contract). Plan: two "
    "scans (extent + binning), one 50-row cell exchange, and a 5-row "
    "result — nothing grows with data volume except the scans.",
)
def q155_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = E(spark, sf_dir)
    pts = e.filter(F.col("value").isNotNull()).select(
        "event_type",
        "value",
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("s1"),
    )
    ext = (
        pts.filter(F.col("s1") == 1)
        .groupBy(F.col("event_type").alias("e_type"))
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    binned = pts.join(
        F.broadcast(ext), pts.event_type == ext.e_type
    ).select(
        "event_type",
        F.least(
            F.greatest(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _PSI_BINS
                ).cast("bigint"),
                F.lit(0),
            ),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
        "s1",
    )
    cells = binned.groupBy("event_type", "bin").agg(
        F.sum("s1").cast("bigint").alias("c1"),
        F.sum(1 - F.col("s1")).cast("bigint").alias("c2"),
    )
    w_all = Window.partitionBy("event_type")
    tot = cells.select(
        "event_type",
        "c1",
        "c2",
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    p = (F.col("c1") + 0.5) / (F.col("n1") + _PSI_BINS * 0.5)
    q = (F.col("c2") + 0.5) / (F.col("n2") + _PSI_BINS * 0.5)
    term = (p - q) * F.log(p / q)
    return tot.groupBy("event_type").agg(
        F.first("n1").cast("bigint").alias("n_ref"),
        F.first("n2").cast("bigint").alias("n_cur"),
        rnd(
            F.sum(F.floor(term * 1000000.0).cast("bigint")).cast("double")
            / 1000000.0,
            5,
        ).alias("psi"),
    )


# ---------------------------------------------------------------------------
# q165 — A/B two-proportion z-test (experimentation primitive)
# ---------------------------------------------------------------------------


@register(
    "q165_ab_proportion_test",
    f"""
    WITH pts AS (
        SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS day,
               user_id % 2 AS arm,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        FROM events
    ), cells AS (
        SELECT day,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x_a,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x_b
        FROM pts GROUP BY day
    )
    SELECT day, n_a, x_a, n_b, x_b,
           {_rnd_sql(
               "CAST((x_a * n_b - x_b * n_a) AS DOUBLE)"
               " * (x_a * n_b - x_b * n_a)"
               " / (n_a * n_b) * (n_a + n_b)"
               " / (x_a + x_b) / (n_a + n_b - x_a - x_b)", 6)} AS z2
    FROM cells
    WHERE n_a > 0 AND n_b > 0 AND x_a + x_b > 0
      AND x_a + x_b < n_a + n_b
    """,
    doc="daily A/B two-proportion z-test: split users into arms by "
    "user-id parity, conversion = purchase event, and per day report "
    "the squared pooled z statistic z^2 = (pA - pB)^2 / (p(1-p)(1/nA + "
    "1/nB)) — the significance gate every experimentation platform "
    "evaluates continuously (z^2 > 3.84 ~ p < 0.05). The statistic is "
    "algebraically rearranged so ALL products are computed on exact "
    "integer counts and the doubles enter only in one fixed-order "
    "expression (no pA/pB intermediates whose rounding could differ), "
    "rounded 6dp. Degenerate days (an empty arm, zero or unanimous "
    "conversion) are excluded — the statistic is undefined there. "
    "Plan: one conditional-sum groupBy on day (31 groups), map-side "
    "partials, nothing scales beyond the scan.",
)
def q165_ab_proportion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = E(spark, sf_dir)
    pts = e.select(
        F.dayofmonth("ts").cast("bigint").alias("day"),
        (F.col("user_id") % 2).alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    cells = pts.groupBy("day").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x_b"),
    )
    d = F.col("x_a") * F.col("n_b") - F.col("x_b") * F.col("n_a")
    x = F.col("x_a") + F.col("x_b")
    nx = F.col("n_a") + F.col("n_b") - x
    n = F.col("n_a") + F.col("n_b")
    # z^2 = d^2 * n / (nA * nB * x * (n - x)) with d = xA*nB - xB*nA:
    # algebraically equal to (pA-pB)^2 / (p(1-p)(1/nA+1/nB)) but with all
    # products on exact integers and ONE fixed-order double expression
    # (division order matches the oracle token-for-token)
    z2 = (
        d.cast("double") * d / (F.col("n_a") * F.col("n_b")) * n / x / nx
    )
    return cells.filter(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (x > 0) & (x < n)
    ).select("day", "n_a", "x_a", "n_b", "x_b", rnd(z2, 6).alias("z2"))


# ---------------------------------------------------------------------------
# q184 — rolling PSI: the drift TRAJECTORY, one score per day vs a fixed
#         reference week
# ---------------------------------------------------------------------------

_RPSI_REF_DAYS = 7


@register(
    "q184_rolling_psi",
    f"""
    WITH pts AS (
        SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d, value
        FROM events WHERE value IS NOT NULL
    ), ext AS (
        SELECT MIN(value) AS lo, MAX(value) AS hi FROM pts WHERE d <= {_RPSI_REF_DAYS}
    ), binned AS (
        SELECT p.d,
               LEAST(GREATEST(CAST(FLOOR((p.value - x.lo) / (x.hi - x.lo)
                                          * {_PSI_BINS}) AS BIGINT), 0),
                     {_PSI_BINS - 1}) AS bin
        FROM pts p CROSS JOIN ext x
    ), ref AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS c1
        FROM binned WHERE d <= {_RPSI_REF_DAYS} GROUP BY bin
    ), cur AS (
        SELECT d, bin, CAST(COUNT(*) AS BIGINT) AS c2
        FROM binned WHERE d > {_RPSI_REF_DAYS} GROUP BY d, bin
    ), grid AS (
        SELECT dd.d, b.i AS bin
        FROM (SELECT DISTINCT d FROM pts WHERE d > {_RPSI_REF_DAYS}) dd
        CROSS JOIN generate_series(0, {_PSI_BINS - 1}) AS b(i)
    ), cells AS (
        SELECT g.d, g.bin, COALESCE(r.c1, 0) AS c1, COALESCE(c.c2, 0) AS c2
        FROM grid g
        LEFT JOIN ref r ON g.bin = r.bin
        LEFT JOIN cur c ON g.d = c.d AND g.bin = c.bin
    ), tot AS (
        SELECT d, c1, c2,
               SUM(c1) OVER (PARTITION BY d) AS n1,
               SUM(c2) OVER (PARTITION BY d) AS n2
        FROM cells
    )
    SELECT d AS day,
           CAST(ANY_VALUE(n2) AS BIGINT) AS n_cur,
           {_rnd_sql("CAST(SUM(CAST(FLOOR((" + _PSI_TERM + ") * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0", 5)} AS psi
    FROM tot GROUP BY d
    """,
    doc="the drift TRAJECTORY beside q155's two-sample snapshot: PSI of "
    f"the value distribution for every day after day {_RPSI_REF_DAYS}, "
    f"each against the fixed reference week (days 1–{_RPSI_REF_DAYS}), "
    "over 10 equal-width bins of the reference extent with 0.5 "
    "pseudo-count smoothing — the shape a monitoring dashboard plots "
    "and alerts on (PSI > 0.2 is the conventional page). Every day "
    "joins the SAME frozen reference histogram, so one scan builds the "
    "per-(day, bin) cells and the reference is a 10-row broadcast; the "
    "full day x bin grid (zero-filled both sides) makes bins that "
    "drain to zero still contribute their smoothed term. Fixed-order "
    "double terms quantized floor-1e-6 before the integer sum (q155's "
    "portability contract, same libm ln). Plan: two scans (extent + "
    "binning), cells bounded by days x bins — nothing scales with row "
    "count but the scans.",
)
def q184_rolling_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = E(spark, sf_dir)
    pts = e.filter(F.col("value").isNotNull()).select(
        F.dayofmonth("ts").cast("bigint").alias("d"), "value"
    )
    ext = pts.filter(F.col("d") <= _RPSI_REF_DAYS).agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = pts.crossJoin(F.broadcast(ext)).select(
        "d",
        F.least(
            F.greatest(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _PSI_BINS
                ).cast("bigint"),
                F.lit(0),
            ),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
    )
    ref = (
        binned.filter(F.col("d") <= _RPSI_REF_DAYS)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    )
    cur = (
        binned.filter(F.col("d") > _RPSI_REF_DAYS)
        .groupBy("d", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    )
    grid = (
        pts.filter(F.col("d") > _RPSI_REF_DAYS)
        .select("d")
        .distinct()
        .crossJoin(
            F.broadcast(
                e.sparkSession.range(_PSI_BINS).select(F.col("id").alias("bin"))
            )
        )
    )
    cells = (
        grid.join(F.broadcast(ref), "bin", "left")
        .join(cur, ["d", "bin"], "left")
        .select(
            "d",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
    )
    w_day = Window.partitionBy("d")
    tot = cells.select(
        "d",
        "c1",
        "c2",
        F.sum("c1").over(w_day).alias("n1"),
        F.sum("c2").over(w_day).alias("n2"),
    )
    p = (F.col("c1") + 0.5) / (F.col("n1") + _PSI_BINS * 0.5)
    q = (F.col("c2") + 0.5) / (F.col("n2") + _PSI_BINS * 0.5)
    term = (p - q) * F.log(p / q)
    return tot.groupBy(F.col("d").alias("day")).agg(
        F.first("n2").cast("bigint").alias("n_cur"),
        rnd(
            F.sum(F.floor(term * 1000000.0).cast("bigint")).cast("double")
            / 1000000.0,
            5,
        ).alias("psi"),
    )


# ---------------------------------------------------------------------------
# q186 — Cohen's kappa: inter-annotator agreement over label pairs
# ---------------------------------------------------------------------------

_KAPPA_CHAR_EDGES = (216, 379)  # tercile-ish char-length cut points
_KAPPA_WORD_EDGES = (39, 69)  # tercile-ish word-count cut points


@register(
    "q186_cohens_kappa",
    f"""
    WITH labeled AS (
        SELECT CASE WHEN LENGTH(text) < {_KAPPA_CHAR_EDGES[0]} THEN 0
                    WHEN LENGTH(text) < {_KAPPA_CHAR_EDGES[1]} THEN 1
                    ELSE 2 END AS a,
               CASE WHEN LEN(string_split(text, ' ')) < {_KAPPA_WORD_EDGES[0]} THEN 0
                    WHEN LEN(string_split(text, ' ')) < {_KAPPA_WORD_EDGES[1]} THEN 1
                    ELSE 2 END AS b
        FROM documents
    ), cells AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM labeled GROUP BY a, b
    ), n_tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS agree
        FROM cells
    ), marg AS (
        SELECT CAST(COALESCE(SUM(ra.ca * rb.cb), 0) AS BIGINT) AS chance
        FROM (SELECT a AS k, SUM(c) AS ca FROM cells GROUP BY a) ra
        JOIN (SELECT b AS k, SUM(c) AS cb FROM cells GROUP BY b) rb
          ON ra.k = rb.k
    )
    SELECT n, agree, chance,
           {_rnd_sql("CAST(agree AS DOUBLE) / n", 6)} AS p_observed,
           {_rnd_sql("CAST(chance AS DOUBLE) / n / n", 6)} AS p_expected,
           {_rnd_sql(
               "(CAST(agree AS DOUBLE) / n - CAST(chance AS DOUBLE) / n / n)"
               " / (1.0 - CAST(chance AS DOUBLE) / n / n)", 6)} AS kappa
    FROM n_tot CROSS JOIN marg
    """,
    doc="inter-annotator agreement for labeled-data QA: two deterministic "
    "'annotators' bucket every document into 3 classes (char-length "
    "terciles vs word-count terciles — correlated but not identical, "
    "like two real raters sharing a rubric), and Cohen's kappa corrects "
    "their raw agreement for chance: kappa = (po - pe) / (1 - pe) with "
    "pe from the marginal products. Everything reduces to a 9-cell "
    "confusion matrix — one scan, one 9-row aggregate, integer "
    "sufficient statistics (n, agree, chance) carried exactly and "
    "divided once at the end (q65's moments contract), so the score is "
    "engine-identical at any corpus size. The label pair here is the "
    "audit hook: swap either CASE for a model-vs-human or "
    "annotator-vs-annotator column and the plan is unchanged.",
)
def q186_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    labeled = d.select(
        F.when(F.length("text") < _KAPPA_CHAR_EDGES[0], 0)
        .when(F.length("text") < _KAPPA_CHAR_EDGES[1], 1)
        .otherwise(2)
        .alias("a"),
        F.when(n_words < _KAPPA_WORD_EDGES[0], 0)
        .when(n_words < _KAPPA_WORD_EDGES[1], 1)
        .otherwise(2)
        .alias("b"),
    )
    cells = labeled.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    n_tot = cells.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    ra = cells.groupBy(F.col("a").alias("k")).agg(F.sum("c").alias("ca"))
    rb = cells.groupBy(F.col("b").alias("k")).agg(F.sum("c").alias("cb"))
    marg = (
        ra.join(rb, "k")
        .agg(
            F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
            .cast("bigint")
            .alias("chance")
        )
    )
    po = F.col("agree").cast("double") / F.col("n")
    pe = F.col("chance").cast("double") / F.col("n") / F.col("n")
    return n_tot.crossJoin(F.broadcast(marg)).select(
        "n",
        "agree",
        "chance",
        rnd(po, 6).alias("p_observed"),
        rnd(pe, 6).alias("p_expected"),
        rnd((po - pe) / (1.0 - pe), 6).alias("kappa"),
    )
