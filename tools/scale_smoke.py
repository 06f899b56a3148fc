"""Scale smoke: replicate the sf0.1 fact tables N× in /tmp (unique keys per
replica, so join/group cardinalities scale too) and re-run headline plans.
Verifies no driver-side collects, no plan blow-ups, and roughly linear
scaling as data grows beyond the bench point.

Usage: python tools/scale_smoke.py [replicas=16]
Prints one JSON line: {"replicas": N, "rows": {...}, "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
QUERIES = ["q01_pricing_summary", "q03_top_orders", "q05_region_revenue",
           "q06_global_agg", "q14_window_topn", "q18_topk_orders",
           "q53_minhash_near_dup", "q62_dedup_components", "q72_dedup_materialize",
           "q111_cluster_canonical", "q93_dedup_pipeline", "q64_decontamination",
           "q82_sequence_packing", "q83_sessionization", "q84_funnel",
           "q87_expectation_audit", "q88_corpus_filter", "q89_heavy_hitters",
           "q117_vocab_coverage", "q118_basket_pairs", "q120_transition_matrix",
           "q126_copurchase_triangles", "q127_quantile_bucketize",
           "q128_bm25_scoring", "q130_zorder_layout", "q131_global_index",
           "q132_bloom_semi_join", "q133_interval_islands", "q134_pareto_skyline",
           "q135_power_iteration", "q136_chisq_drift", "q137_association_rules",
           "q138_auc_rank", "q139_ks_drift", "q140_split_gain",
           "q141_bigram_perplexity", "q143_fk_integrity",
           "q144_decay_score", "q145_count_min_sketch",
           "q146_last_touch_attribution", "q147_distinct_n",
           "q148_rrf_fusion", "q149_seasonal_anomaly",
           "q150_bucketed_dedup_chain", "q152_setjoin_prefix_filter",
           "q153_sliding_distinct", "q156_feature_matrix",
           "q159_linear_attribution", "q160_interval_overlap_join",
           "q161_proportional_allocation", "q162_bfs_levels"]
# fact tables replicated with shifted keys; dims copied as-is.
# documents replicate with IDENTICAL text — deliberately: N× literal
# duplication is the near-dup operator's worst case (every LSH bucket's
# membership multiplies by N, the in-bucket pair grid by N²), i.e. the
# common-crawl-style duplication profile the dedup path must survive.
FACTS = {"lineitem": ["l_orderkey"], "orders": ["o_orderkey", "o_custkey"],
         "documents": ["doc_id"],
         # customer replicates with c_custkey shifted by the SAME stride
         # as orders.o_custkey, so every replicated order keeps a matching
         # customer — without this, ~90% of orders were orphaned and
         # customer-join row counts understated true sf1 cost (r6 verdict
         # fidelity caveat)
         "customer": ["c_custkey"],
         # embeddings replicate verbatim under shifted vec_ids — the same
         # duplication worst case as documents (every cosine bucket's
         # membership multiplies by N), so embedding-arm queries bench
         # against N× vectors
         "embeddings": ["vec_id"],
         # shifting user_id multiplies the user population while keeping
         # each user's history length constant — the realistic growth
         # axis for sessionization/funnel (more entities, not deeper ones)
         "events": ["event_id", "user_id"]}
KEY_STRIDE = 100_000_000


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    out_dir = tempfile.mkdtemp(prefix="scale_smoke_")
    spark = (
        SparkSession.builder.appName("scale-smoke")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    try:
        # events.parquet is TIMESTAMP(NANOS); read it the way E() does
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        rows = {}
        # true dims: their keys are never shifted by any fact replica, so
        # copying keeps referential integrity (l_partkey/l_suppkey/
        # c_nationkey all still resolve)
        for name in ("region", "nation", "supplier", "part"):
            shutil.copy(f"{SRC}/{name}.parquet", f"{out_dir}/{name}.parquet")
        for name, keys in FACTS.items():
            base = spark.read.parquet(f"{SRC}/{name}.parquet")
            rep = spark.range(replicas).select(F.col("id").alias("__rep__"))
            scaled = base.crossJoin(rep)
            for k in keys:
                scaled = scaled.withColumn(k, F.col(k) + F.col("__rep__") * KEY_STRIDE)
            scaled.drop("__rep__").repartition(32).write.mode("overwrite").parquet(
                f"{out_dir}/{name}.parquet"
            )
            rows[name] = spark.read.parquet(f"{out_dir}/{name}.parquet").count()

        from etl_entregas_pyspark_spark import queries as q

        times = {}
        for name in QUERIES:
            t0 = time.time()
            q.REGISTRY[name].spark(spark, out_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 2)
        print(json.dumps({"replicas": replicas, "rows": rows, "queries": times}))
    finally:
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
