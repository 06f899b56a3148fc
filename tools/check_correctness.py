"""Local differential-testing harness: runs every registry query on Spark
AND its DuckDB oracle over the same parquet, then compares
row count, column names, and an order-insensitive canonicalized value hash
(the driver's CORRECTNESS gate, reproduced locally for fast iteration).

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    # Decimal → normalized string
    if type(v).__name__ == "Decimal":
        return repr(float(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(columns, rows):
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = ["\x01".join(canon_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.appName("check-correctness")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from etl_entregas_pyspark_spark import queries as q

    n_pass = n_fail = n_rowsonly = 0
    for name, spec in sorted(q.REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.spark(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.sql(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_types = [str(t) for t in res.types]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue

        problems = []
        # The driver canonicalizes with pandas sort_values, which cannot
        # hash list/dict cells (q38 crashed r02+r03 on this). Any
        # array/map/struct output column is a latent driver crash: reject
        # here and serialize it (array_join / to_json) in BOTH engines.
        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols:
            problems.append(
                f"complex-typed output columns crash the driver canonicalizer: "
                f"{complex_cols} — serialize with array_join/to_json in both engines"
            )
        # The driver fetches the oracle pandas-style, which renders HUGEINT
        # as float64 ("4933.0" vs Spark's "4933") and breaks the value hash
        # even when fetchall() matches bitwise. Any 128-bit integer column
        # in an oracle is therefore a latent driver hash-fail: reject here.
        huge = [f"{c}:{t}" for c, t in zip(d_cols, d_types) if "HUGEINT" in t]
        if huge:
            problems.append(
                f"oracle emits 128-bit ints (driver renders as float64): {huge} "
                "— wrap the aggregate in CAST(... AS BIGINT)"
            )
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
            if cs != cd:
                diff = [(a, b) for a, b in zip(cs, cd) if a != b]
                problems.append(
                    f"values: {len(diff)}/{len(cs)} rows differ; first: "
                    f"spark={diff[0][0][:140]!r} duck={diff[0][1][:140]!r}"
                )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"OK    {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} failed")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
