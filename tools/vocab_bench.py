"""High-vocabulary corpus bench (r6 verdict #5): the driver testdata's
documents table has a 31-word vocabulary, which makes every word-level
similarity measure degenerate (~72% of all pairs Jaccard-similar) and
BM25/perplexity/LSH timings unrepresentatively easy. This tool
synthesizes a DETERMINISTIC high-vocabulary twin of the sf0.1 corpus —
same document count and length profile, ~20k-word zipf-ish vocabulary,
planted verbatim duplicates (doc_id % 37 == 0 copies doc_id-3, at the
SOURCE doc's length so the copy is exact, not a prefix/extension) and
near-duplicates (doc_id % 10 == 7 copies doc_id-3 with every 7th word
mutated); plants only copy non-plant sources and verbatim wins the %370
overlap, so every %37 plant is a true exact copy — entirely from Spark
built-ins (xxhash64 arithmetic, no RNG),
then times q53 / q128 / q141 / q152 on BOTH corpora and prints one JSON
line for SCALE.md's measured-scaling section.

Usage: python tools/vocab_bench.py [vocab_size=20000]
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
QUERIES = [
    "q53_minhash_near_dup",
    "q128_bm25_scoring",
    "q141_bigram_perplexity",
    "q152_setjoin_prefix_filter",
    "q192_lsh_recall_audit",
]


def build_high_vocab_docs(spark, out_dir: str, vocab: int) -> int:
    base = spark.read.parquet(f"{SRC}/documents.parquet").select(
        "doc_id", "lang", "source", F.size(F.split("text", " ")).alias("n_words")
    )
    # near-dup sources: doc_id % 10 == 7 copies doc_id-3's words with
    # every 7th word swapped; % 37 == 0 copies doc_id-3 verbatim. The
    # word stream is a deterministic function of (src_id, pos), so the
    # "copy" regenerates the source's words — but a true verbatim dup
    # also needs the SOURCE's length (a copy truncated/extended to its
    # own n_words is only a prefix-duplicate), so planted rows take
    # n_words from the source via a broadcastable id self-join. Stride 3
    # (not 1) so planted pairs survive q152's doc_id % 3 == 0 oracle
    # subset.
    # ... and plants only copy NON-plant sources: a source that is itself
    # a plant has text regenerated from ITS source's id, so re-invoking
    # the generator with the source's id would not reproduce it
    src_is_plant = ((F.col("doc_id") - 3) % 10 == 7) | (
        (F.col("doc_id") - 3) % 37 == 0
    )
    plantable = (F.col("doc_id") > 2) & ~src_is_plant
    src_id = (
        F.when((F.col("doc_id") % 10 == 7) & plantable, F.col("doc_id") - 3)
        .when((F.col("doc_id") % 37 == 0) & plantable, F.col("doc_id") - 3)
        .otherwise(F.col("doc_id"))
    )
    # verbatim wins on the %370 overlap (37, 407, ...): "%37==0 ⇒ exact
    # copy" must hold unconditionally for the dedup-recall accounting
    mutate = (
        (F.col("doc_id") % 10 == 7) & (F.col("doc_id") % 37 != 0) & plantable
    )
    src_len = base.select(
        F.col("doc_id").alias("src_id"), F.col("n_words").alias("src_n_words")
    )
    base = (
        base.withColumn("src_id", src_id)
        .join(F.broadcast(src_len), "src_id")
        .withColumn("n_words", F.col("src_n_words"))
        .drop("src_n_words")
    )

    def word(id_col, pos):
        # log-uniform rank in [0, vocab): heavy head, long tail — the
        # zipf-ish shape real term frequencies have, from pure hash math
        u = (F.abs(F.xxhash64(id_col, pos)) % 1_000_000) / 1_000_000.0
        rank = F.floor(F.exp(u * float(__import__("math").log(vocab)))) - 1
        return F.concat(F.lit("w"), rank.cast("long").cast("string"))

    words = F.transform(
        F.sequence(F.lit(1), F.col("n_words")),
        lambda pos: F.when(
            mutate & (pos % 7 == 0), word(F.col("doc_id") + 500_000, pos)
        ).otherwise(word(F.col("src_id"), pos)),
    )
    docs = base.select(
        "doc_id",
        F.concat_ws(" ", words).alias("text"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.repartition(8).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    return spark.read.parquet(f"{out_dir}/documents.parquet").count()


def time_queries(spark, sf_dir: str) -> dict:
    from etl_entregas_pyspark_spark import queries as q

    out = {}
    for name in QUERIES:
        spec = q.REGISTRY[name]
        best, rows = None, None
        for timed in (False, True, True):
            t0 = time.time()
            df = spec.spark(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            if timed:
                best = dt if best is None else min(best, dt)
            rows = n
            spark.catalog.clearCache()
        out[name] = {"sec": round(best, 2), "rows": rows}
        if name == "q192_lsh_recall_audit":
            # the single audit row's VALUES are the point: recall of the
            # banded LSH against the exhaustive truth on this corpus
            r = spec.spark(spark, sf_dir).collect()[0]
            out[name]["audit"] = {
                "n_true_pairs": r.n_true_pairs,
                "n_missed": r.n_missed,
                "recall": r.recall,
                "expected_recall": r.expected_recall,
            }
    return out


def main() -> None:
    vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    out_dir = tempfile.mkdtemp(prefix="vocab_bench_")
    spark = (
        SparkSession.builder.appName("vocab-bench")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # the four queries read only documents; symlink the rest
        n = build_high_vocab_docs(spark, out_dir, vocab)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            os.symlink(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")
        n_vocab = (
            spark.read.parquet(f"{out_dir}/documents.parquet")
            .select(F.explode(F.split("text", " ")).alias("w"))
            .select("w").distinct().count()
        )
        hi = time_queries(spark, out_dir)
        lo = time_queries(spark, SRC)
        print(json.dumps({
            "metric": "vocab_bench",
            "docs": n,
            "distinct_words_high": n_vocab,
            "distinct_words_driver": 31,
            "high_vocab": hi,
            "driver_corpus": lo,
        }))
    finally:
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
