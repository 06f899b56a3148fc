"""Declarative data-quality expectation audit (Deequ/Great-Expectations
style), the warehouse-grade generalization of the reference's quality
ladder (reference ``src/etl_entregas.py:128-169`` counts nulls /
invalid types / duplicates while cleaning; an expectation audit states
the contract up front and verifies the whole table in one pass).

Every check is folded into a single global aggregate (plus one
key-grouped aggregate for the uniqueness check), so the audit costs one
scan + one partial-aggregated exchange regardless of table size; the
check fan-out happens AFTER aggregation on a one-row frame via
``stack`` — no per-check scans, no driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.registry import register
from etl_entregas_pyspark_spark.queries.relational import T, _rnd_sql, rnd


@register(
    "q87_expectation_audit",
    f"""
    WITH m AS (
        SELECT COUNT(*) AS n,
               COUNT(l_orderkey) AS n_ok,
               MIN(l_quantity) AS min_q,
               MAX(l_quantity) AS max_q,
               CAST(SUM(CASE WHEN l_returnflag NOT IN ('A','N','R')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_flag,
               MIN(l_extendedprice) AS min_price
        FROM lineitem
    ), d AS (
        SELECT CAST(SUM(c - 1) AS BIGINT) AS n_dup
        FROM (SELECT COUNT(*) AS c FROM lineitem
              GROUP BY l_orderkey, l_linenumber)
    )
    SELECT * FROM (
        SELECT 'completeness_l_orderkey' AS check_name,
               {_rnd_sql('CAST(n_ok AS DOUBLE) / n', 6)} AS value,
               n_ok = n AS passed FROM m
        UNION ALL
        SELECT 'range_l_quantity_1_50', CAST(max_q AS DOUBLE),
               min_q >= 1 AND max_q <= 50 FROM m
        UNION ALL
        SELECT 'domain_l_returnflag', CAST(n_bad_flag AS DOUBLE),
               n_bad_flag = 0 FROM m
        UNION ALL
        SELECT 'unique_orderkey_linenumber', CAST(n_dup AS DOUBLE),
               n_dup = 0 FROM d
        UNION ALL
        SELECT 'non_negative_l_extendedprice', min_price,
               min_price >= 0.0 FROM m
    )
    """,
    doc="single-pass expectation audit over lineitem: completeness, "
    "numeric range, categorical domain, composite-key uniqueness, "
    "non-negativity — five declared contracts verified with ONE table "
    "scan folded into a global aggregate (uniqueness adds one "
    "key-grouped aggregate whose exchange carries pre-combined "
    "(key, count) rows). The five result rows are stacked from the "
    "one-row metric frames, so check count never multiplies scan count.",
)
def q87_expectation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    m = li.agg(
        F.count("*").alias("n"),
        F.count("l_orderkey").alias("n_ok"),
        F.min("l_quantity").alias("min_q"),
        F.max("l_quantity").alias("max_q"),
        F.sum(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0)
        ).cast("bigint").alias("n_bad_flag"),
        F.min("l_extendedprice").alias("min_price"),
    )
    d = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") - 1).cast("bigint").alias("n_dup"))
    )
    one = m.crossJoin(F.broadcast(d)).select(
        "*", rnd(F.col("n_ok").cast("double") / F.col("n"), 6).alias("completeness")
    )
    return one.select(
        F.expr(
            """stack(5,
            'completeness_l_orderkey', completeness, n_ok = n,
            'range_l_quantity_1_50', CAST(max_q AS DOUBLE),
                min_q >= 1 AND max_q <= 50,
            'domain_l_returnflag', CAST(n_bad_flag AS DOUBLE), n_bad_flag = 0,
            'unique_orderkey_linenumber', CAST(n_dup AS DOUBLE), n_dup = 0,
            'non_negative_l_extendedprice', min_price, min_price >= 0.0d
            ) AS (check_name, value, passed)"""
        )
    )


# ---------------------------------------------------------------------------
# q119 — Benford first-digit audit (fraud / synthetic-data smell test)
# ---------------------------------------------------------------------------

@register(
    "q119_benford_audit",
    f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS d
        FROM orders
        WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) >= 1
    ), g AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
    )
    SELECT d, n,
           {_rnd_sql('CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS BIGINT)', 6)}
               AS observed_p,
           {_rnd_sql('log10(CAST(d + 1 AS DOUBLE)) - log10(CAST(d AS DOUBLE))', 6)}
               AS benford_p
    FROM g ORDER BY d
    """,
    doc="Benford's-law audit of order totals: distribution of the first "
    "significant digit vs the log10((d+1)/d) expectation — the classic "
    "screen for fabricated or synthetically generated monetary columns. "
    "The digit is taken from the BIGINT cents rendering (never from "
    "double-to-string formatting, which differs across engines), and "
    "multiplying by 100 leaves the leading significant digit unchanged. "
    "One scan folded into a 9-row partial-aggregated groupBy; the share "
    "denominator is a window sum over those 9 rows. Scan-bound and "
    "skew-free at any table size.",
)
def q119_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = T(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    g = (
        o.select(cents.alias("cents"))
        .filter(F.col("cents") >= 1)
        .select(F.substring(F.col("cents").cast("string"), 1, 1).cast("bigint").alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy()).cast("bigint")
    dd = F.col("d").cast("double")
    return g.select(
        "d",
        "n",
        rnd(F.col("n").cast("double") / total, 6).alias("observed_p"),
        rnd(F.log10(dd + 1) - F.log10(dd), 6).alias("benford_p"),
    ).orderBy("d")


# ---------------------------------------------------------------------------
# q121 — robust outlier detection via median absolute deviation (MAD)
# ---------------------------------------------------------------------------

# 3 sigma × the 1.4826 normal-consistency constant, written as ONE literal:
# literal*literal arithmetic inside oracle SQL would constant-fold at
# extended precision in DuckDB and diverge from Spark's IEEE runtime.
_MAD_K = "4.4478"


@register(
    "q121_mad_outliers",
    f"""
    WITH c AS (
        SELECT c_mktsegment, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer
    ), med AS (
        SELECT c_mktsegment, quantile_cont(cents, 0.5) AS med_cents
        FROM c GROUP BY c_mktsegment
    ), dev AS (
        SELECT c.c_mktsegment, ABS(CAST(cents AS DOUBLE) - med_cents) AS adev
        FROM c JOIN med USING (c_mktsegment)
    ), mad AS (
        SELECT c_mktsegment, quantile_cont(adev, 0.5) AS mad_cents
        FROM dev GROUP BY c_mktsegment
    )
    SELECT dev.c_mktsegment AS segment,
           MIN(med.med_cents) AS med_cents,
           MIN(mad.mad_cents) AS mad_cents,
           CAST(SUM(CASE WHEN adev > {_MAD_K} * mad_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dev
    JOIN mad USING (c_mktsegment)
    JOIN med USING (c_mktsegment)
    GROUP BY dev.c_mktsegment
    ORDER BY segment
    """,
    doc="robust per-segment outlier screen: |x - median| > "
    "3·1.4826·MAD on account balances, all in the exact integer cents "
    "domain (medians of BIGINTs interpolate to exact .5 halves — "
    "bitwise-stable across engines, see q36/q71). Exact percentile "
    "collects each group's values into one aggregate buffer, so this "
    "formulation is for bounded-cardinality groups (5 segments here); "
    "at 100-TB scale swap percentile → approx_percentile exactly as "
    "q35 substitutes for q17's global ntile — the plan shape (two "
    "grouped aggregates + two broadcast joins back) is unchanged.",
)
def q121_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    med = cust.groupBy("c_mktsegment").agg(
        F.percentile("cents", F.lit(0.5)).alias("med_cents")
    )
    dev = cust.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment",
        "med_cents",
        F.abs(F.col("cents").cast("double") - F.col("med_cents")).alias("adev"),
    )
    mad = dev.groupBy("c_mktsegment").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_cents")
    )
    out = F.when(F.col("adev") > F.lit(float(_MAD_K)) * F.col("mad_cents"), 1).otherwise(0)
    return (
        dev.join(F.broadcast(mad), "c_mktsegment")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.min("med_cents").alias("med_cents"),
            F.min("mad_cents").alias("mad_cents"),
            F.sum(out).cast("bigint").alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# q143 — referential-integrity (FK orphan) audit across the star schema
# ---------------------------------------------------------------------------

_FK_RELS = [
    # (name, child table, child key, parent table, parent key)
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("events_customer", "events", "user_id", "customer", "c_custkey"),
]


def _fk_sql(name: str, child: str, ck: str, parent: str, pk: str) -> str:
    return f"""
        SELECT '{name}' AS fk_name,
               CAST(SUM(c.n) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN p.{pk} IS NULL THEN c.n ELSE 0 END) AS BIGINT)
                   AS n_orphan_rows,
               CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_orphan_keys
        FROM (SELECT {ck} AS k, COUNT(*) AS n FROM {child}
              WHERE {ck} IS NOT NULL GROUP BY {ck}) c
        LEFT JOIN {parent} p ON c.k = p.{pk}
    """


@register(
    "q143_fk_integrity",
    " UNION ALL ".join(_fk_sql(*rel) for rel in _FK_RELS),
    doc="referential-integrity audit over every FK edge of the star schema "
    "(+ the deliberately unconstrained events.user_id edge, the one that "
    "CAN orphan): per edge, total child rows, orphan rows, and distinct "
    "orphan keys. The plan never joins the raw fact to the dimension: "
    "children first collapse to per-key counts (partial-aggregated, so "
    "the exchange carries distinct keys, not rows), then a "
    "dimension-sized LEFT join — broadcast for every dim here — scores "
    "orphanhood, and a constant-width rollup finishes. Five edges = five "
    "independent branch plans unioned; at 100 TB each branch is one "
    "fact-scan + one key-domain exchange, and AQE broadcasts every "
    "parent side.",
)
def q143_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, child, ck, parent, pk in _FK_RELS:
        c = (
            T(spark, sf_dir, child)
            .filter(F.col(ck).isNotNull())
            .groupBy(F.col(ck).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        p = T(spark, sf_dir, parent).select(F.col(pk).alias("pk"))
        j = c.join(F.broadcast(p), c.k == p.pk, "left")
        branch = j.agg(
            F.lit(name).alias("fk_name"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("pk").isNull(), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("n_orphan_rows"),
            F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_orphan_keys"),
        )
        out = branch if out is None else out.unionByName(branch)
    return out


# ---------------------------------------------------------------------------
# q149 — seasonal (hour-of-day) anomaly baseline over event volumes
# ---------------------------------------------------------------------------

_ANOM_K2 = 4  # flag when (c - mean)^2 > K2 * var, i.e. |z| > 2


@register(
    "q149_seasonal_anomaly",
    f"""
    WITH daily AS (
        SELECT event_type,
               CAST(ts AS DATE) AS d,
               EXTRACT(hour FROM ts) AS hod,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2, 3
    ), stats AS (
        SELECT event_type, hod,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS q
        FROM daily GROUP BY event_type, hod
    )
    SELECT s.event_type, s.hod, s.n_days,
           {_rnd_sql('CAST(s.s AS DOUBLE) / s.n_days', 4)} AS mean_c,
           CAST(SUM(CASE WHEN
                    POWER(CAST(d.c AS DOUBLE) * s.n_days - s.s, 2)
                    > {_ANOM_K2} * (CAST(s.q AS DOUBLE) * s.n_days - CAST(s.s AS DOUBLE) * s.s)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM daily d JOIN stats s ON d.event_type = s.event_type AND d.hod = s.hod
    GROUP BY s.event_type, s.hod, s.n_days, s.s, s.q
    """,
    doc="seasonal anomaly baseline: for each (event_type, hour-of-day) "
    "cell, the daily event count is compared against that cell's own "
    "across-days mean/variance — the ops-monitoring pattern that "
    "separates 'traffic is low for 3am' from 'traffic is low'. The |z|>2 "
    "test is evaluated WITHOUT square roots or variance division via "
    "(c*n - S)^2 > K2*(n*Q - S^2) over exact integer sufficient stats "
    "(S, Q) — products go through IEEE doubles identically in both "
    "engines (single expressions, no accumulation), and the flag count "
    "per cell is an integer. Plan: the raw scan collapses to per-(type, "
    "day, hour) partial counts; the stats rollup is 120 cells broadcast "
    "back onto the daily frame (AQE picks the broadcast); no windows at "
    "all, so nothing single-partitions at any scale.",
)
def q149_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_entregas_pyspark_spark.queries.events import E

    e = E(spark, sf_dir)
    daily = e.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("d"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    stats = daily.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    j = daily.join(F.broadcast(stats), ["event_type", "hod"])
    dev2 = F.pow(F.col("c").cast("double") * F.col("n_days") - F.col("s"), 2)
    var_n2 = F.col("q").cast("double") * F.col("n_days") - F.col("s").cast(
        "double"
    ) * F.col("s")
    return j.groupBy("event_type", "hod", "n_days", "s", "q").agg(
        F.sum(F.when(dev2 > _ANOM_K2 * var_n2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_anomalies"),
    ).select(
        "event_type",
        "hod",
        "n_days",
        rnd(F.col("s").cast("double") / F.col("n_days"), 4).alias("mean_c"),
        "n_anomalies",
    )


# ---------------------------------------------------------------------------
# q164 — categorical diversity audit: Shannon entropy + Gini impurity
# ---------------------------------------------------------------------------


@register(
    "q164_category_entropy",
    f"""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        GROUP BY lang, source
    ), per_lang AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_sources,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * c) AS BIGINT) AS sum_c2,
               CAST(SUM(CAST(FLOOR((CASE WHEN c > 0
                        THEN c * LOG2(CAST(c AS DOUBLE)) ELSE 0 END)
                        * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS clog
        FROM cells GROUP BY lang
    )
    SELECT lang, n_sources, n,
           {_rnd_sql("LOG2(CAST(n AS DOUBLE)) - clog / n", 6)} AS entropy_bits,
           {_rnd_sql("1.0 - CAST(sum_c2 AS DOUBLE) / (CAST(n AS DOUBLE) * n)", 6)}
               AS gini
    FROM per_lang
    """,
    doc="categorical diversity audit per language: Shannon entropy and "
    "Gini impurity of the source-distribution — the corpus-mixture "
    "monitor a training-data pipeline runs beside q86's mixture "
    "weights (has one source quietly taken over a language slice?). "
    "Entropy uses the exact-count identity H = log2(n) - sum(c*log2(c))"
    "/n with per-cell terms floor-1e-4 quantized before the integer "
    "sum (order-independent, q140's contract); Gini is PURE integer "
    "arithmetic (1 - sum(c^2)/n^2) with a single final division — "
    "bitwise cross-engine. Plan: one (lang, source) partial-aggregated "
    "exchange, then a per-lang rollup of a few dozen cells; cost is "
    "the scan, state is the category cross-product.",
)
def q164_category_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    clog_cell = F.when(
        F.col("c") > 0, F.col("c") * F.log2(F.col("c").cast("double"))
    ).otherwise(F.lit(0.0))
    per_lang = cells.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c2"),
        (
            F.sum(F.floor(clog_cell * 10000.0).cast("bigint")).cast("double")
            / 10000.0
        ).alias("clog"),
    )
    return per_lang.select(
        "lang",
        "n_sources",
        "n",
        rnd(
            F.log2(F.col("n").cast("double")) - F.col("clog") / F.col("n"), 6
        ).alias("entropy_bits"),
        rnd(
            1.0
            - F.col("sum_c2").cast("double")
            / (F.col("n").cast("double") * F.col("n")),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# q187 — Merkle-style partition diff: find WHERE two snapshots differ
#         without a row-level comparison
# ---------------------------------------------------------------------------

_MDIFF_UPDATE_FROM = "2001-01-01"  # late partitions receive updates...
_MDIFF_DELETE_FROM = "2001-06-01"  # ...and the latest also lose rows


def _mdiff_row_hash_sql(qty: str) -> str:
    from etl_entregas_pyspark_spark.queries.similarity import _md5_int_sql

    return _md5_int_sql(
        "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)"
        f" || '|' || CAST(CAST({qty} AS BIGINT) AS VARCHAR)"
    )


@register(
    "q187_merkle_partition_diff",
    f"""
    WITH a AS (
        SELECT strftime(l_shipdate, '%Y-%m') AS part,
               {_mdiff_row_hash_sql('l_quantity')} AS rh
        FROM lineitem
    ), b_src AS (
        SELECT l_shipdate, l_orderkey, l_linenumber,
               CASE WHEN l_shipdate >= TIMESTAMP '{_MDIFF_UPDATE_FROM}'
                         AND l_orderkey % 97 = 0
                    THEN l_quantity + 1 ELSE l_quantity END AS q
        FROM lineitem
        WHERE NOT (l_shipdate >= TIMESTAMP '{_MDIFF_DELETE_FROM}'
                   AND l_orderkey % 101 = 0)
    ), b AS (
        SELECT strftime(l_shipdate, '%Y-%m') AS part,
               {_mdiff_row_hash_sql('q')} AS rh
        FROM b_src
    ), pa AS (
        SELECT part, CAST(COUNT(*) AS BIGINT) AS n_rows_a, bit_xor(rh) AS h_a
        FROM a GROUP BY part
    ), pb AS (
        SELECT part, CAST(COUNT(*) AS BIGINT) AS n_rows_b, bit_xor(rh) AS h_b
        FROM b GROUP BY part
    )
    SELECT COALESCE(pa.part, pb.part) AS part,
           COALESCE(n_rows_a, 0) AS n_rows_a,
           COALESCE(n_rows_b, 0) AS n_rows_b
    FROM pa FULL JOIN pb ON pa.part = pb.part
    WHERE pa.part IS NULL OR pb.part IS NULL
       OR n_rows_a != n_rows_b OR h_a != h_b
    """,
    doc="incremental-sync primitive: compare two snapshots of a 100-TB "
    "table by PARTITION-LEVEL content fingerprints and emit only the "
    "partitions that changed — the Merkle idea flattened one level "
    "(partition digests instead of a tree; at petabyte scale add a "
    "digest-of-digests layer the same way). Row hash = md5 of the "
    "business key + payload; partition digest = bit_xor of row hashes, "
    "which is order- and partition-layout-independent and cannot "
    "overflow (the sum-based digest would need modular arithmetic to "
    "stay portable). Snapshot B is snapshot A with deterministic "
    "late-partition updates (+1 qty on orderkey%97 from "
    f"{_MDIFF_UPDATE_FROM}) and deletes (orderkey%101 from "
    f"{_MDIFF_DELETE_FROM}), so early partitions MUST digest equal and "
    "drop out — the row-level diff a downstream job would run now "
    "touches only the changed months. Cost: two scans, two "
    "partial-aggregated exchanges keyed on partition, a "
    "partition-count-sized join; no row ever crosses the network. The "
    "deliberate trap q81's reconciliation would miss: equal row COUNTS "
    "with different content (pure updates) — caught here by the digest, "
    "which is why the diff predicate checks both.",
)
def q187_merkle_partition_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_entregas_pyspark_spark.queries.similarity import md5_int

    li = T(spark, sf_dir, "lineitem")

    def row_hash(qty: F.Column) -> F.Column:
        return md5_int(
            F.concat_ws(
                "|",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                qty.cast("bigint").cast("string"),
            )
        )

    part = F.date_format("l_shipdate", "yyyy-MM").alias("part")
    a = li.select(part, row_hash(F.col("l_quantity")).alias("rh"))
    b_src = li.filter(
        ~(
            (F.col("l_shipdate") >= F.lit(_MDIFF_DELETE_FROM).cast("timestamp"))
            & (F.col("l_orderkey") % 101 == 0)
        )
    ).select(
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.when(
            (F.col("l_shipdate") >= F.lit(_MDIFF_UPDATE_FROM).cast("timestamp"))
            & (F.col("l_orderkey") % 97 == 0),
            F.col("l_quantity") + 1,
        )
        .otherwise(F.col("l_quantity"))
        .alias("q"),
    )
    b = b_src.select(part, row_hash(F.col("q")).alias("rh"))
    pa = a.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows_a"),
        F.expr("bit_xor(rh)").alias("h_a"),
    )
    pb = b.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows_b"),
        F.expr("bit_xor(rh)").alias("h_b"),
    )
    joined = pa.join(pb, "part", "full_outer")
    return joined.filter(
        F.col("n_rows_a").isNull()
        | F.col("n_rows_b").isNull()
        | (F.col("n_rows_a") != F.col("n_rows_b"))
        | (F.col("h_a") != F.col("h_b"))
    ).select(
        "part",
        F.coalesce("n_rows_a", F.lit(0)).cast("bigint").alias("n_rows_a"),
        F.coalesce("n_rows_b", F.lit(0)).cast("bigint").alias("n_rows_b"),
    )
