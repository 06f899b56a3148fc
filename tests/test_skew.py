"""Skew-mitigation operators: salted results must equal plain results."""

import pytest
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
    skew_profile,
    with_salt,
)


@pytest.fixture(scope="module")
def skewed_df(spark):
    # one hot key ("HOT" = 5000 rows) + a long tail
    rows = [("HOT", i, float(i % 97)) for i in range(5000)]
    rows += [(f"k{i % 50}", i, float(i % 13)) for i in range(2000)]
    return spark.createDataFrame(rows, ["key", "id", "val"]).repartition(8)


def test_salt_is_deterministic_and_bounded(spark, skewed_df):
    s1 = with_salt(skewed_df, ["key"], 16).select("id", "__salt__").collect()
    s2 = with_salt(skewed_df, ["key"], 16).select("id", "__salt__").collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    assert all(0 <= r["__salt__"] < 16 for r in s1)
    # the hot key actually spreads across salts
    n_salts = (
        with_salt(skewed_df.filter(F.col("key") == "HOT"), ["key"], 16)
        .select("__salt__").distinct().count()
    )
    assert n_salts > 8


def test_salted_aggregate_matches_plain(spark, skewed_df):
    plain = {
        (r.key): (r.total, r.n, r.mx)
        for r in skewed_df.groupBy("key")
        .agg(F.sum("val").alias("total"), F.count("val").alias("n"), F.max("val").alias("mx"))
        .collect()
    }
    salted = {
        (r.key): (r.total, r.n, r.mx)
        for r in salted_aggregate(
            skewed_df,
            ["key"],
            {"total": ("val", "sum"), "n": ("val", "count"), "mx": ("val", "max")},
            n_salts=16,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, skewed_df):
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"k{i}", f"dim{i}") for i in range(50)],
        ["key", "label"],
    )
    plain = skewed_df.join(dim, "key").groupBy("key", "label").count()
    salted = salted_broadcast_left(skewed_df, dim, "key", n_salts=8).groupBy("key", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_skew_profile_finds_hot_key(spark, skewed_df):
    prof = skew_profile(skewed_df, ["key"], top=3).collect()
    assert prof[0].key == "HOT"
    assert prof[0].share > 0.5
