"""Data-quality rules (reference ``apply_data_quality``,
``src/etl_entregas.py:117-172``) with order-preserving semantics:

    P1 null/blank material -> P2 delivery-type IN-list -> P3 exact dedup
    -> P4 country IN-list (no metric recorded for P4, parity quirk)

Metric parity trap (SURVEY §7.1): the duplicate count is duplicates found
AMONG rows that already passed P1+P2 (197 on the golden CSV, not the 227
raw duplicates), so rule order is part of the spec.

Scalability: the reference runs 11 uncached ``count()`` actions — each one
re-executes the whole lineage from the source. Here the entire metric
ladder is ONE aggregation pass (``quality_metrics``): conditional counts
via ``sum(when(...))`` and the dedup ladder via ``count_distinct`` over a
full-row struct, all computed map-side-partial then merged. At 100 TB this
is a single scan + one exchange instead of ~7 full scans.

The transformed DataFrame itself (``apply_quality``) stays a pure lazy
plan: filter -> filter -> dropDuplicates -> filter, which Catalyst pushes
into the scan where possible.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_blank_predicate(column: str) -> Column:
    """Rows to REMOVE under P1: NULL or trims to empty string."""
    col = F.col(column)
    return col.isNull() | (F.trim(col) == "")


def keep_clean(df: DataFrame, column: str = "material") -> DataFrame:
    """P1 — drop rows whose ``column`` is NULL/blank."""
    return df.filter(~null_blank_predicate(column))


def keep_in_list(df: DataFrame, column: str, values: Sequence[str], normalize_upper: bool = False) -> DataFrame:
    """P2/P4 — IN-list filter, optionally normalizing case first."""
    col = F.upper(F.col(column)) if normalize_upper else F.col(column)
    return df.filter(col.isin(list(values)))


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """P3 — exact duplicate removal; hash-shuffle on the dedup key set.

    At scale: ``dropDuplicates`` is a partial-aggregate + exchange +
    final-aggregate — Spark keeps one row per key per partition before the
    shuffle, so the exchange carries at most one row per distinct key per
    map partition, not the full input.
    """
    return df.dropDuplicates(list(subset) if subset else None)


def apply_quality(df: DataFrame, config: Mapping[str, Any]) -> DataFrame:
    """The composed P1→P2→P3→P4 lazy plan (no actions)."""
    dq = config.get("data_quality", {})
    rules = config.get("business_rules", {}).get("delivery_types", {})
    valid_types = list(rules.get("routine", [])) + list(rules.get("bonus", []))
    out = df
    if dq.get("remove_null_material", True):
        out = keep_clean(out, "material")
    if valid_types:
        out = keep_in_list(out, "tipo_entrega", valid_types)
    if dq.get("remove_duplicates", True):
        out = dedup_exact(out)
    if dq.get("validate_country_codes", True) and dq.get("valid_countries"):
        out = keep_in_list(out, "pais", [c.upper() for c in dq["valid_countries"]], normalize_upper=True)
    return out


def metrics_frame(df: DataFrame, config: Mapping[str, Any]) -> DataFrame:
    """The full DQ metric ladder as a ONE-row, one-pass aggregate plan.

    Same values as the reference's sequential count-after-each-rule
    (``src/etl_entregas.py:127-169``) without re-scanning the source per
    rule: conditional counts are ``sum(when(...))``, and the dedup ladder
    is a two-phase aggregate keyed on a 128-bit xxhash64 row fingerprint —
    group to (fingerprint, rule flags, multiplicity) with map-side partial
    aggregation, then one scalar rollup (details in the block comment
    below).

    Assumes every column casts injectively to string (the fingerprint
    input): frames limited to atomic column types — which all current
    callers are. An array/map/struct column would need the groupBy(*cols)
    shape instead.
    """
    dq = config.get("data_quality", {})
    rules = config.get("business_rules", {}).get("delivery_types", {})
    valid_types = list(rules.get("routine", [])) + list(rules.get("bonus", []))
    valid_countries = [c.upper() for c in dq.get("valid_countries", [])]

    p1_removed = null_blank_predicate("material")
    p2_removed = (~p1_removed) & ~F.col("tipo_entrega").isin(valid_types)
    passes_12 = (~p1_removed) & F.col("tipo_entrega").isin(valid_types)
    valid_country = F.upper(F.col("pais")).isin(valid_countries)

    # Two-phase shape: group to (distinct row, multiplicity) first, then
    # one scalar aggregate. A single-agg formulation with two
    # count_distinct(struct) would plan an Expand — 3× the input rows
    # through the shuffle. The distinct-row key is a 128-bit row
    # fingerprint (two independent xxhash64 seeds — the q42 md5-
    # fingerprint exact-dedup idiom) rather than the full column tuple:
    # the rule predicates are functions of the row, hence constant within
    # a fingerprint group, so they ride the grouping key as four booleans
    # and the exchange carries ~17 bytes + flags per distinct row instead
    # of the whole string payload (guide §2.3: shuffle keys and metadata,
    # not payloads). Distinct rows colliding on both hashes would merge —
    # ~n²/2¹²⁹ for n distinct rows, i.e. < 10⁻²⁰ even at 100 TB row
    # counts — and the DuckDB oracle hash-gates the exact counts at every
    # tested SF.
    # NULL discipline: Spark's xxhash64 SKIPS null inputs (a null column
    # leaves the running hash unchanged), so rows differing only in which
    # column is null could structurally collide. Feeding coalesced string
    # casts PLUS one is-null flag per column makes the input sequence
    # injective again: the flag pins every null position, so coalesce's
    # NULL→'' collapse is always disambiguated.
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
    flags = [F.col(c).isNull() for c in df.columns]
    keyed = df.select(
        F.xxhash64(F.lit(1), *cols, *flags).alias("h1"),
        F.xxhash64(F.lit(2), *cols, *flags).alias("h2"),
        p1_removed.alias("f_p1"),
        p2_removed.alias("f_p2"),
        passes_12.alias("f_p12"),
        (passes_12 & valid_country).alias("f_ok"),
    )
    per_row = keyed.groupBy("h1", "h2", "f_p1", "f_p2", "f_p12", "f_ok").agg(
        F.count(F.lit(1)).alias("row_multiplicity")
    )
    n = F.col("row_multiplicity")
    return per_row.agg(
        F.sum(n).alias("input_rows"),
        F.sum(F.when(F.col("f_p1"), n).otherwise(F.lit(0))).alias("null_material_removed"),
        F.sum(F.when(F.col("f_p2"), n).otherwise(F.lit(0))).alias("invalid_type_removed"),
        (
            F.sum(F.when(F.col("f_p12"), n).otherwise(F.lit(0)))
            - F.count(F.when(F.col("f_p12"), F.lit(1)))
        ).alias("duplicates_removed"),
        F.count(F.when(F.col("f_ok"), F.lit(1))).alias("final_rows"),
    )


def quality_metrics(df: DataFrame, config: Mapping[str, Any]) -> dict[str, int]:
    """``metrics_frame`` collected to a plain dict (one action)."""
    agg = metrics_frame(df, config).collect()[0]
    return {k: int(agg[k] or 0) for k in agg.asDict()}
