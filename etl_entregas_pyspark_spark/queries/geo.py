"""q168 — geospatial distance join via grid-cell blocking.

The reference has no geo surface (SURVEY §2 — the operator inventory is
pure tabular ETL); this adds the missing family: "find entity pairs
within R km" without the cartesian theta-join Spark would otherwise plan.
Coordinates are synthesized deterministically from customer keys (the
testdata carries no lat/lon), so both engines derive identical points and
the oracle stays a brute-force haversine over all pairs.

Blocking geometry, chosen for EXACTNESS (the oracle forgives nothing):
1° cells over lat ∈ [-45°, 45°]. Within that band one degree of
longitude spans ≥ 111·cos(45°) = 78.6 km and one degree of latitude
111 km — both > R = 50 km — so two points further than one cell apart on
either axis are provably > R apart, and candidates = pairs in the same
or 8-adjacent cells (longitude neighbors wrap mod 360, so antimeridian
pairs are kept). The candidate equi-join carries ids + coordinates only;
haversine verifies exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.registry import register
from etl_entregas_pyspark_spark.queries.relational import T, _rnd_sql, rnd
from etl_entregas_pyspark_spark.queries.similarity import _md5_int_sql, md5_int

_R_KM = 50.0
_LAT_SPAN = 45  # degrees each side of the equator


def _lat_sql(key: str) -> str:
    h = _md5_int_sql("'lat#' || CAST(" + key + " AS VARCHAR)")
    return f"(({h} % {2 * _LAT_SPAN * 1000}) / 1000.0 - {_LAT_SPAN})"


def _lon_sql(key: str) -> str:
    h = _md5_int_sql("'lon#' || CAST(" + key + " AS VARCHAR)")
    return f"(({h} % 360000) / 1000.0 - 180)"


_HAV = (
    "12742.0 * ASIN(SQRT("
    "POWER(SIN(RADIANS(b.lat - a.lat) / 2), 2)"
    " + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))"
    " * POWER(SIN(RADIANS(b.lon - a.lon) / 2), 2)))"
)


@register(
    "q168_geo_distance_join",
    f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               {_lat_sql('c_custkey')} AS lat,
               {_lon_sql('c_custkey')} AS lon
        FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b,
           {_rnd_sql(_HAV, 3)} AS dist_km
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE {_HAV} <= {_R_KM}
    """,
    doc="geospatial radius join: every customer pair within 50 km, by "
    "great-circle (haversine) distance over deterministically "
    "hash-synthesized coordinates — the proximity-join primitive "
    "(store-coverage, meetup-matching, contact-tracing shapes) Spark "
    "has no native operator for. Blocking: 1-degree grid cells over "
    "lat [-45, 45]; within the band a full cell exceeds 50 km on both "
    "axes, so candidates are exactly the same-or-adjacent-cell pairs "
    "(longitude neighbors wrap mod 360 — antimeridian pairs survive), "
    "and each unordered pair is generated ONCE (the one-cell side "
    "holds the smaller id). The equi-join shuffles (cell -> ids + "
    "coords) only; haversine verifies with the identical fixed-order "
    "libm expression in both engines. Oracle: brute-force all-pairs "
    "haversine, so green certifies exact recall of the blocking "
    "geometry. At 100 TB the cell is also the storage partition key, "
    "so the join prunes to co-resident cells; denser radii shrink the "
    "cell and the same adjacency argument holds.",
)
def q168_geo_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    lat = (
        md5_int(F.concat(F.lit("lat#"), F.col("c_custkey").cast("string")))
        % (2 * _LAT_SPAN * 1000)
    ) / 1000.0 - _LAT_SPAN
    lon = (
        md5_int(F.concat(F.lit("lon#"), F.col("c_custkey").cast("string")))
        % 360000
    ) / 1000.0 - 180
    pts = c.select(
        F.col("c_custkey").alias("id"), lat.alias("lat"), lon.alias("lon")
    )
    cell_lat = F.floor(F.col("lat")).cast("long")
    cell_lon = F.floor(F.col("lon")).cast("long")
    # side A: one (cell) emission per point; side B: its 9-cell neighborhood
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        cell_lat.alias("cl"),
        cell_lon.alias("cn"),
    )
    offsets = F.expr(
        "explode(array(-1, 0, 1))"
    )
    b = (
        pts.select(
            F.col("id").alias("id_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            cell_lat.alias("bl"),
            cell_lon.alias("bn"),
        )
        .select("*", offsets.alias("dl"))
        .select("*", F.expr("explode(array(-1, 0, 1))").alias("dn"))
        .select(
            "id_b",
            "lat_b",
            "lon_b",
            (F.col("bl") + F.col("dl")).alias("cl"),
            # longitude wraps: cells are [-180, 179], 360 of them
            (
                F.pmod(F.col("bn") + F.col("dn") + 180, F.lit(360)) - 180
            ).alias("cn"),
        )
    )
    cand = a.join(b, ["cl", "cn"]).filter(F.col("id_a") < F.col("id_b"))
    hav = 12742.0 * F.asin(
        F.sqrt(
            F.pow(F.sin(F.radians(F.col("lat_b") - F.col("lat_a")) / 2), 2)
            + F.cos(F.radians("lat_a"))
            * F.cos(F.radians("lat_b"))
            * F.pow(F.sin(F.radians(F.col("lon_b") - F.col("lon_a")) / 2), 2)
        )
    )
    return cand.filter(hav <= _R_KM).select(
        "id_a", "id_b", rnd(hav, 3).alias("dist_km")
    )
