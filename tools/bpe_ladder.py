"""BPE merge-mining scale ladder: measures the vocabulary-boundedness
claim in q257's docstring.

The loop's cost model is: ONE corpus-scale word-count shuffle, then
per-round work bounded by the DISTINCT-WORD vocabulary (pair explode +
argmax + 1-row broadcast apply). Real corpora grow vocabulary
sublinearly (Heaps' law); the driver's synthetic corpus saturates at a
31-word vocabulary, which would make the claim trivially true, so this
ladder adds a 20k-word zipf-ish corpus (alpha-only twin of
tools/vocab_bench.py's generator — BPE's ^[a-z]+$ gate rejects digit
words) and its 10x verbatim replication: corpus words grow 10x with the
vocabulary EXACTLY constant, so the mining rounds' wall must stay flat
while only the initial scan grows. That separation — scan wall scaling
with the corpus, round wall scaling with the vocabulary — is the
100-TB-trainability property.

Rungs:
  sf0.01       driver corpus (31-word vocab)
  sf0.1        driver corpus, 10x the words, same 31-word vocab
  hv20k        sf0.1-shaped corpus, 20k-word zipf-ish vocabulary
  hv20k_x10    the same corpus replicated 10x under shifted doc_ids
               (freqs x10, vocabulary identical)

Prints one JSON line for SCALE.md's measured-scaling section.

Usage: python tools/bpe_ladder.py [vocab=20000]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.text import (
    _BPE_ROUNDS,
    _bpe_apply,
    _bpe_best,
    _bpe_vocab0,
)

SRC = "/root/testdata/sf0.1"


def build_alpha_vocab_docs(spark, out_dir: str, vocab: int, replicas: int) -> None:
    """sf0.1-shaped corpus over an alpha-only ~``vocab``-word zipf-ish
    vocabulary (vocab_bench's hash-math generator with digit ranks
    transliterated to letters), optionally replicated ``replicas`` times
    verbatim under shifted doc_ids (same vocabulary, scaled freqs)."""
    base = spark.read.parquet(f"{SRC}/documents.parquet").select(
        "doc_id", "lang", "source", F.size(F.split("text", " ")).alias("n_words")
    )

    def word(id_col, pos):
        u = (F.abs(F.xxhash64(id_col, pos)) % 1_000_000) / 1_000_000.0
        rank = (F.floor(F.exp(u * float(math.log(vocab)))) - 1).cast("long")
        return F.concat(
            F.lit("w"), F.translate(rank.cast("string"), "0123456789", "abcdefghij")
        )

    words = F.transform(
        F.sequence(F.lit(1), F.col("n_words")),
        lambda pos: word(F.col("doc_id"), pos),
    )
    docs = base.select(
        "doc_id", F.concat_ws(" ", words).alias("text"), "lang", "source"
    ).withColumn("n_chars", F.length("text").cast("long"))
    if replicas > 1:
        rep = spark.range(replicas).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(F.broadcast(rep)).select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    docs.repartition(16).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def run_rung(spark, label: str, sf_dir: str) -> dict:
    t0 = time.time()
    vocab = _bpe_vocab0(spark, sf_dir)  # eager localCheckpoint
    scan_wall = time.time() - t0
    stats = vocab.agg(
        F.count(F.lit(1)).alias("vocab_words"),
        F.sum("freq").alias("corpus_words"),
    ).collect()[0]
    arr = F.split("seq", " ")
    n_pairs0 = (
        vocab.select(
            F.explode(
                F.when(
                    F.size(arr) >= 2,
                    F.zip_with(
                        F.slice(arr, 1, F.size(arr) - 1),
                        F.slice(arr, 2, F.size(arr) - 1),
                        lambda a, b: F.concat(a, F.lit(" "), b),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pair")
        )
        .distinct()
        .count()
    )
    t0 = time.time()
    for t in range(1, _BPE_ROUNDS + 1):
        best = _bpe_best(vocab, t)
        if t < _BPE_ROUNDS:
            vocab = _bpe_apply(vocab, best)
    rounds_wall = time.time() - t0
    return {
        "label": label,
        "corpus_words": int(stats.corpus_words),
        "vocab_words": int(stats.vocab_words),
        "distinct_pairs_r0": int(n_pairs0),
        "scan_wall_sec": round(scan_wall, 3),
        "rounds_wall_sec": round(rounds_wall, 3),
        "per_round_sec": round(rounds_wall / _BPE_ROUNDS, 3),
    }


def main() -> None:
    vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bpe_ladder_")
    try:
        rungs = []
        rungs.append(run_rung(spark, "sf0.01", "/root/testdata/sf0.01"))
        rungs.append(run_rung(spark, "sf0.1", SRC))
        hv = f"{tmp}/hv"
        build_alpha_vocab_docs(spark, hv, vocab, replicas=1)
        rungs.append(run_rung(spark, f"hv{vocab}", hv))
        hv10 = f"{tmp}/hv10"
        build_alpha_vocab_docs(spark, hv10, vocab, replicas=10)
        rungs.append(run_rung(spark, f"hv{vocab}_x10", hv10))
        print(
            json.dumps(
                {
                    "metric": "bpe_merge_mining_ladder",
                    "rounds": _BPE_ROUNDS,
                    "rungs": rungs,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
