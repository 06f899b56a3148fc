"""q152 — EXACT set-similarity join with prefix filtering (AllPairs /
PPJoin family, Xiao et al., WWW'08 — public material).

q45/q53 generate near-dup candidates with MinHash-LSH: fast, but
probabilistic — a true pair that collides in no band is silently lost.
Corpus-governance jobs that must certify "no duplicate above τ survives"
(e.g. benchmark decontamination audits) need the EXACT join. The naive
exact join is the O(n²) all-pairs comparison; prefix filtering gives the
scalable decomposition:

1. order each doc's token set by ascending global document frequency
   (rarest first — the canonical AllPairs ordering, maximizing pruning);
2. Jaccard ≥ τ forces overlap ≥ ⌈τ·|x|⌉ (since |y| ≥ τ·|x|), so two
   qualifying sets MUST share a token inside their first
   |x| − ⌈τ·|x|⌉ + 1 tokens — everything past the prefix can be ignored
   for candidate generation;
3. candidates = docs sharing any prefix token (an equi-join on the token,
   O(collisions) — and prefix tokens are by construction the RAREST, so
   buckets stay small);
4. exact Jaccard verification on the full token sets.

The DuckDB oracle is the brute-force all-pairs join, so a driver-green
row certifies exact recall, not approximate recall — the property LSH
cannot offer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_entregas_pyspark_spark.queries.registry import register
from etl_entregas_pyspark_spark.queries.relational import T, _rnd_sql, rnd

_TAU = 0.5
_SUBSET_MOD = 3  # doc_id % 3 == 0 — bounds the oracle's all-pairs check


def _q152_oracle() -> str:
    jac = (
        "CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / "
        "(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))"
    )
    return f"""
    WITH docs AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents WHERE doc_id % {_SUBSET_MOD} = 0
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           {_rnd_sql(jac, 4)} AS jaccard
    FROM docs a JOIN docs b ON a.doc_id < b.doc_id
    WHERE {jac} >= {_TAU}
    """


@register(
    "q152_setjoin_prefix_filter",
    _q152_oracle(),
    doc="exact set-similarity join: ALL document pairs with word-set "
    "Jaccard >= 0.5, via prefix filtering — tokens ranked rarest-first "
    "by global document frequency, each doc emits only its first "
    "|x| - ceil(tau*|x|) + 1 tokens as join keys (a qualifying pair "
    "must share one: J >= tau forces overlap >= ceil(tau*|x|)), "
    "candidates verified with exact Jaccard. Oracle is the brute-force "
    "all-pairs join, so green means EXACT recall — the guarantee the "
    "MinHash path (q45/q53) trades away. Plan: token-frequency join + "
    "one per-doc window over its own tokens (partitioned by doc_id — "
    "never global), prefix-token equi-join with doc-id-only payload, "
    "verify join fetches full token arrays for candidates only. At "
    "100 TB the frequency table is computed once per corpus snapshot "
    "and broadcast in tiers (hot tokens) / hash-joined (tail); bucket "
    "explosion is bounded because prefixes hold the RAREST tokens.",
)
def q152_setjoin_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _SUBSET_MOD == 0)
        .select(
            "doc_id",
            F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok"),
        )
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = toks.join(freq, "tok")
    w_pos = Window.partitionBy("doc_id").orderBy(F.col("df"), F.col("tok"))
    w_sz = Window.partitionBy("doc_id")
    ordered = ranked.select(
        "doc_id",
        "tok",
        F.row_number().over(w_pos).alias("pos"),
        F.count(F.lit(1)).over(w_sz).alias("sz"),
    )
    prefix = ordered.filter(
        F.col("pos") <= F.col("sz") - F.ceil(F.lit(_TAU) * F.col("sz")) + 1
    )
    buckets = (
        prefix.groupBy("tok")
        .agg(F.collect_list("doc_id").alias("docs"))
        .filter(F.size("docs") > 1)
    )
    docs_col = F.col("docs")
    pair_grid = F.flatten(
        F.transform(
            docs_col,
            lambda x: F.transform(
                docs_col, lambda y: F.struct(x.alias("a"), y.alias("b"))
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_grid).alias("p"))
        .filter(F.col("p.a") < F.col("p.b"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    per_doc = toks.groupBy("doc_id").agg(F.collect_list("tok").alias("toks"))
    a = per_doc.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("tok_a"))
    b = per_doc.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tok_b"))
    pairs = cand.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect(F.col("tok_a"), F.col("tok_b"))).cast("double")
    union = (
        F.size("tok_a")
        + F.size("tok_b")
        - F.size(F.array_intersect(F.col("tok_a"), F.col("tok_b")))
    )
    jac = inter / union
    return pairs.filter(jac >= _TAU).select(
        "doc_a", "doc_b", rnd(jac, 4).alias("jaccard")
    )
