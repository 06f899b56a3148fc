"""Hybrid-retrieval operators: fusion of the lexical (BM25) and semantic
(embedding-cosine) ranking arms built elsewhere in the corpus.

Lives in its own module imported AFTER text.py and similarity.py: the
fusion oracle embeds q128's oracle SQL verbatim (one definition of BM25
across the registry), which requires q128 to be registered already.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.registry import register
from etl_entregas_pyspark_spark.queries.relational import T
from etl_entregas_pyspark_spark.queries.similarity import dot, sq_norm


# ---------------------------------------------------------------------------
# q148 — reciprocal-rank fusion of lexical (BM25) and semantic (cosine)
# retrieval — the hybrid-search merge every modern RAG stack runs
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_PER_LIST = 30
_RRF_TOPK = 15


def _q148_oracle() -> str:
    from etl_entregas_pyspark_spark.queries.registry import REGISTRY
    from etl_entregas_pyspark_spark.queries.relational import _rnd_sql

    bm25 = REGISTRY["q128_bm25_scoring"].oracle
    dotp = (
        "list_sum(list_transform(generate_series(1, len(e.embedding)), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))"
    )
    nrm = (
        "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    rrf = (
        f"COALESCE(1.0 / ({_RRF_K} + l.r_lex), 0.0)"
        f" + COALESCE(1.0 / ({_RRF_K} + s.r_sem), 0.0)"
    )
    return f"""
    WITH lex AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
        FROM ({bm25})
        LIMIT {_RRF_PER_LIST}
    ), qv AS (
        SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0
    ), sem0 AS (
        SELECT e.vec_id AS doc_id,
               {dotp} / ({nrm.format(v='e.embedding')} * {nrm.format(v='q.q_emb')}) AS cosine
        FROM embeddings e CROSS JOIN qv q WHERE e.vec_id <> 0
    ), sem30 AS (
        SELECT doc_id, cosine FROM sem0 ORDER BY cosine DESC, doc_id LIMIT {_RRF_PER_LIST}
    ), sem AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r_sem
        FROM sem30
    )
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           l.r_lex, s.r_sem,
           {_rnd_sql(rrf, 6)} AS rrf
    FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    ORDER BY rrf DESC, doc_id LIMIT {_RRF_TOPK}
    """


@register(
    "q148_rrf_fusion",
    _q148_oracle(),
    doc=f"hybrid-retrieval reciprocal-rank fusion: the BM25 top-"
    f"{_RRF_PER_LIST} (q128's exact machinery, reused verbatim — its "
    f"oracle SQL is embedded as a CTE) merges with the cosine top-"
    f"{_RRF_PER_LIST} against a query embedding (vec 0) via "
    f"RRF(d) = sum 1/({_RRF_K}+rank), the standard k={_RRF_K} Cormack "
    "fusion every RAG stack ships. Determinism: both ranks carry doc_id "
    "tie-breaks, RRF is a fixed-order two-term sum of exact divisions, "
    "half-up 6dp. Plan shape: each arm ends in TakeOrderedAndProject "
    "(distributed top-k, never a global sort of the corpus); the "
    "row_number windows then rank MODEL-STATE-sized 30-row frames "
    "(whitelisted in the plan lint), and the fusion is a full-outer "
    "join of two 30-row frames. The 100-TB cost is the two arms' own "
    "scans — fusion itself is constant work.",
)
def q148_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from etl_entregas_pyspark_spark.queries.text import q128_bm25_scoring

    lex30 = q128_bm25_scoring(spark, sf_dir).select("doc_id", "bm25").limit(
        _RRF_PER_LIST
    )
    w_lex = Window.orderBy(F.col("bm25").desc(), "doc_id")
    lex = lex30.select("doc_id", F.row_number().over(w_lex).alias("r_lex"))

    e = T(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    c = e.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("c_emb")
    )
    cos = dot(F.col("c_emb"), F.col("q_emb")) / (
        F.sqrt(sq_norm(F.col("c_emb"))) * F.sqrt(sq_norm(F.col("q_emb")))
    )
    sem30 = (
        c.crossJoin(F.broadcast(qv))
        .select("doc_id", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(_RRF_PER_LIST)
    )
    w_sem = Window.orderBy(F.col("cosine").desc(), "doc_id")
    sem = sem30.select("doc_id", F.row_number().over(w_sem).alias("r_sem"))

    fused = lex.join(sem, "doc_id", "full_outer")
    rrf = F.coalesce(1.0 / (_RRF_K + F.col("r_lex")), F.lit(0.0)) + F.coalesce(
        1.0 / (_RRF_K + F.col("r_sem")), F.lit(0.0)
    )
    from etl_entregas_pyspark_spark.queries.relational import rnd

    return (
        fused.select("doc_id", "r_lex", "r_sem", rnd(rrf, 6).alias("rrf"))
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(_RRF_TOPK)
    )
