"""Skew mitigation for hot keys (100 TB concern; SURVEY §2 scale notes).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on by default in
session.SCALE_DEFAULTS) handles most cases at runtime. These helpers cover
the two shapes AQE does not:

- **salted_aggregate**: a two-phase groupBy for aggregations whose single
  hot key would pin one reducer — phase 1 aggregates on (key, salt),
  phase 2 merges the ≤ n_salts partials per key. Works for any
  merge-decomposable aggregate (sum/count/min/max).
- **salted_broadcast_left**: replicate-and-salt pattern for joining a
  skewed fact against a dimension too large to broadcast whole but small
  enough to replicate n_salts ways: fact rows get a random-but-deterministic
  salt, the dim side is exploded across all salts, and the join key becomes
  (key, salt) — splitting each hot key across n_salts reducers.

Salts are derived with pmod(hash(...)) — deterministic per row, so plans
stay reproducible and AQE/retries see stable data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SALT = "__salt__"


def with_salt(df: DataFrame, cols: Sequence[str], n_salts: int) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of the row's
    non-key columns (falls back to all columns), so identical rows get the
    same salt and the assignment is reproducible across retries."""
    basis = [c for c in df.columns if c not in cols] or list(df.columns)
    return df.withColumn(_SALT, F.pmod(F.hash(*[F.col(c) for c in basis]), F.lit(n_salts)))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs`` maps output column name → (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 shuffles on (keys, salt) — a hot key
    spreads over n_salts reducers; phase 2 merges n_salts rows per key.
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(col).alias(out))
        elif fn in mergers:
            phase1_exprs.append(getattr(F, fn)(col).alias(out))
        else:
            raise ValueError(f"unsupported skew-safe aggregate: {fn!r}")
    partial = (
        with_salt(df, keys, n_salts)
        .groupBy(*keys, _SALT)
        .agg(*phase1_exprs)
    )
    merged = partial.groupBy(*keys).agg(
        *[mergers[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )
    return merged


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact to a replicable dim by splitting every fact key
    across n_salts reducers and replicating the dim across all salts."""
    salted_fact = with_salt(fact, [key], n_salts)
    replicated = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(replicated, on=[key, _SALT], how=how)
    return out.drop(_SALT)


def skew_profile(df: DataFrame, keys: Sequence[str], top: int = 10) -> DataFrame:
    """Hot-key diagnostic: per-key row counts and share of total."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.sum("n_rows").over(Window.partitionBy()))
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(top)
    )
