"""The cross-engine determinism contract behind the oracle checks.

Documents (and guards) the facts the query corpus is built on:
1. native round(double) DISAGREES between Spark and DuckDB on
   half-boundary shortest-repr values — which is why the corpus never uses
   it on doubles;
2. the floor-quantized rnd()/dsum() forms are bitwise-identical across
   engines;
3. float32 dot products folded sequentially are bitwise-identical;
4. md5-hex→bigint parsing matches DuckDB's hex cast.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.relational import dsum, rnd
from etl_entregas_pyspark_spark.queries.similarity import dot, md5_int

HALF_BOUNDARY = [1.005, 0.285, 2.675, 0.025, 0.03125, 123.456789, -2.675]


def test_native_round_disagrees(spark):
    """If this ever starts passing, the rnd()/dsum() workaround could be
    retired — until then, native round on doubles is banned in oracle
    queries."""
    df = spark.createDataFrame([(v,) for v in HALF_BOUNDARY], ["x"])
    s = [r.r for r in df.select(F.round("x", 2).alias("r")).collect()]
    d = [
        r[0]
        for r in duckdb.sql(
            "SELECT round(CAST(x AS DOUBLE),2) FROM (VALUES "
            + ",".join(f"({v!r})" for v in HALF_BOUNDARY)
            + ") t(x)"
        ).fetchall()
    ]
    assert s != d  # 1.005 and 0.285 diverge


def test_rnd_matches_duckdb_floor_form(spark):
    df = spark.createDataFrame([(v,) for v in HALF_BOUNDARY], ["x"])
    s = [r.r for r in df.select(rnd(F.col("x"), 2).alias("r")).collect()]
    d = [
        r[0]
        for r in duckdb.sql(
            "SELECT FLOOR(CAST(x AS DOUBLE) * 100.0 + 0.5) / 100.0 FROM (VALUES "
            + ",".join(f"({v!r})" for v in HALF_BOUNDARY)
            + ") t(x)"
        ).fetchall()
    ]
    assert s == d


def test_dsum_is_partitioning_invariant(spark):
    vals = [(float(f"{i}.{i % 100:02d}"),) for i in range(1, 2000)]
    df1 = spark.createDataFrame(vals, ["x"]).coalesce(1)
    df32 = spark.createDataFrame(list(reversed(vals)), ["x"]).repartition(32)
    a = df1.agg(dsum(F.col("x")).alias("s")).collect()[0].s
    b = df32.agg(dsum(F.col("x")).alias("s")).collect()[0].s
    assert a == b


def test_float_dot_bitwise_matches_duckdb(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") < 20)
    pairs = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("i"),
            F.col("b.vec_id").alias("j"),
            dot(F.col("a.embedding"), F.col("b.embedding")).alias("d"),
        )
    )
    got = {(r.i, r.j): r.d for r in pairs.collect()}
    want = {
        (r[0], r[1]): r[2]
        for r in duckdb.sql(
            f"""
            SELECT a.vec_id, b.vec_id,
                   list_sum(list_transform(list_zip(a.embedding, b.embedding),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            FROM '{sf_dir}/embeddings.parquet' a
            JOIN '{sf_dir}/embeddings.parquet' b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 20 AND b.vec_id < 20
            """
        ).fetchall()
    }
    assert got == want  # bitwise equality, no tolerance


def test_md5_int_matches_duckdb(spark):
    words = ["hello", "world", "mh3|a b c", ""]
    df = spark.createDataFrame([(w,) for w in words], ["s"])
    s = [r.h for r in df.select(md5_int(F.col("s")).alias("h")).collect()]
    d = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT) FROM (VALUES "
            + ",".join(f"('{w}')" for w in words)
            + ") t(s)"
        ).fetchall()
    ]
    assert s == d
