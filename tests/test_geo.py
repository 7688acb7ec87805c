"""Geo operator corners: quantization clamps, Morton-cell locality,
and the radius join's banding completeness where it is hardest —
antimeridian wrap and high latitude (shrinking longitude cells).

The registered q222 differential proves banding == brute force on the
synthetic corpus; these tests prove it on adversarial hand-built
points the corpus may never hit.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from metadata_ingestion_poc_spark.operators.geo import (
    EARTH_RADIUS_KM,
    geo_cell,
    geo_cell_sql,
    haversine_km,
    radius_join,
)


def _hav(lat1, lon1, lat2, lon2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = math.sin(dlat) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(
        dlon
    ) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def test_geo_cell_clamps_poles_and_antimeridian(spark):
    df = spark.createDataFrame(
        [(90.0, 180.0), (-90.0, -180.0), (89.999, 179.999), (0.0, 0.0)],
        "lat double, lon double",
    )
    rows = df.select(geo_cell("lat", "lon", 4).alias("c")).collect()
    cells = 1 << 4
    # every id valid for a 4-bit interleave (< 2^(2*bits)); boundary
    # +90/+180 clamps into the last cell instead of overflowing
    assert all(0 <= r.c < cells * cells for r in rows)


def test_geo_cell_sql_twin_matches(spark, sf_dir):
    import duckdb

    from metadata_ingestion_poc_spark.catalog import load_table

    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr("(s_suppkey * 7919 % 12000) / 100.0 - 60.0").alias("lat"),
        F.expr("(s_suppkey * 104729 % 36000) / 100.0 - 180.0").alias("lon"),
    )
    got = {
        r.s_suppkey: r.c
        for r in sup.select(
            "s_suppkey", geo_cell("lat", "lon", 6).alias("c")
        ).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"""
            SELECT s_suppkey, {geo_cell_sql(
                "(s_suppkey * 7919 % 12000) / 100.0 - 60.0",
                "(s_suppkey * 104729 % 36000) / 100.0 - 180.0", 6)}
            FROM read_parquet('{sf_dir}/supplier.parquet')
            """
        ).fetchall()
    )
    assert got == want


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) <-> London (51.5074, -0.1278) ~ 343.5 km
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)],
        "a double, b double, c double, d double",
    )
    km = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias(
            "km"
        )
    ).first()["km"]
    assert abs(km - _hav(48.8566, 2.3522, 51.5074, -0.1278)) < 1e-9
    assert 330 < km < 350


@pytest.mark.parametrize("bits", [4, 6])
def test_radius_join_matches_brute_force_adversarial(spark, bits):
    """Hand-built adversarial set: antimeridian straddle, high
    latitude (lon cells shrink -> wider dynamic span), equator, and
    cell-boundary points. Banding must return EXACTLY the brute-force
    pair set at every resolution."""
    qpts = [
        (1, 59.5, 179.8),   # high-lat, near antimeridian
        (2, 59.5, -179.9),  # other side of the wrap
        (3, 0.0, 0.05),     # equator, near cell boundary
        (4, -45.0, 90.0),
    ]
    ppts = [
        (10, 59.7, -179.7),  # within ~30 km of q1 ACROSS the wrap
        (11, 59.0, 178.5),
        (12, 0.0, 0.0),
        (13, -44.5, 91.0),
        (14, 30.0, 30.0),    # far from everything
        (15, -59.9, -90.0),
    ]
    radius = 200.0
    q = spark.createDataFrame(qpts, "qid long, q_lat double, q_lon double")
    p = spark.createDataFrame(ppts, "pid long, p_lat double, p_lon double")
    got_list = [
        (r.qid, r.pid)
        for r in radius_join(q, p, radius, bits=bits).collect()
    ]
    got = set(got_list)
    want = {
        (qid, pid)
        for qid, qla, qlo in qpts
        for pid, pla, plo in ppts
        if round(_hav(qla, qlo, pla, plo), 6) <= radius
    }
    assert want, "fixture must produce at least one in-radius pair"
    assert got == want
    # EXACTLY once each: wrapped probe cells must not re-emit a pair
    assert len(got_list) == len(want), got_list
    # the wrap pair specifically must be found
    assert (1, 10) in got


@pytest.mark.parametrize("bits", [4, 6])
def test_radius_join_cross_pole_small_radius(spark, bits):
    """Round-8 fix: a SMALL radius disc that contains the pole has
    in-radius neighbors at ANTIPODAL longitudes (across the pole),
    which no finite 1/cos(lat) span reaches — the operator must force
    the full longitude ring whenever |lat| + r_deg touches the polar
    cap. Before the fix these pairs were silently dropped for radii
    below ~35 km."""
    qpts = [(1, 89.95, 10.0), (2, -89.9, -120.0)]
    ppts = [
        (10, 89.93, -170.0),  # ~9 km from q1, ACROSS the north pole
        (11, 89.97, 100.0),   # ~4 km, quarter-turn longitude
        (12, -89.95, 60.0),   # across the south pole from q2
        (13, 89.0, 10.0),     # same meridian but ~105 km away: out
    ]
    radius = 25.0
    q = spark.createDataFrame(qpts, "qid long, q_lat double, q_lon double")
    p = spark.createDataFrame(ppts, "pid long, p_lat double, p_lon double")
    got_list = [
        (r.qid, r.pid) for r in radius_join(q, p, radius, bits=bits).collect()
    ]
    want = {
        (qid, pid)
        for qid, qla, qlo in qpts
        for pid, pla, plo in ppts
        if round(_hav(qla, qlo, pla, plo), 6) <= radius
    }
    assert (1, 10) in want and (2, 12) in want  # the cross-pole pairs
    assert (1, 13) not in want
    assert set(got_list) == want
    assert len(got_list) == len(want), "duplicated pairs"


def test_radius_join_validates_radius(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "i long, q_lat double, q_lon double")
    with pytest.raises(ValueError, match="radius_km"):
        radius_join(df, df, -5.0)


@pytest.mark.parametrize("bits", [4, 5])
def test_radius_join_polar_full_ring_no_duplicates(spark, bits):
    """Near the pole a modest radius needs the FULL longitude ring:
    the span clamp + array_distinct must cover every cell exactly once
    (a bare pmod of an oversized span would alias offsets onto probed
    cells and duplicate every match; an undersized clamp would skip a
    cell and drop pairs)."""
    qpts = [(1, 88.0, 0.0)]
    # points on the same tiny polar circle at many longitudes — all
    # within ~250 km of the query's latitude ring
    ppts = [(100 + k, 88.5, -180.0 + 30.0 * k) for k in range(12)]
    radius = 2000.0
    q = spark.createDataFrame(qpts, "qid long, q_lat double, q_lon double")
    p = spark.createDataFrame(ppts, "pid long, p_lat double, p_lon double")
    got_list = [
        (r.qid, r.pid) for r in radius_join(q, p, radius, bits=bits).collect()
    ]
    want = {
        (qid, pid)
        for qid, qla, qlo in qpts
        for pid, pla, plo in ppts
        if round(_hav(qla, qlo, pla, plo), 6) <= radius
    }
    assert len(want) == 12  # every ring point is in radius at 88 deg
    assert set(got_list) == want
    assert len(got_list) == len(want), "duplicated pairs"


@pytest.mark.parametrize("bits", [11, 12])
def test_radius_join_fine_grid_near_pole(spark, bits):
    """Round-8 review fix: for grids finer than 0.1°/cell the old
    fixed 89.9° cos clamp undersized the longitude span in the band
    between 89.9° and the polar-cap trigger — pairs a couple of km
    apart at 89.93° were dropped at bits >= 11. The span now uses the
    true |lat| + r_deg (positive cos guaranteed by the polar-cap
    guard)."""
    q = spark.createDataFrame(
        [(1, 89.93, 0.0)], "qid long, q_lat double, q_lon double"
    )
    p = spark.createDataFrame(
        [(10, 89.93, 15.0), (11, 89.93, 180.0)],
        "pid long, p_lat double, p_lon double",
    )
    got = {
        (r.qid, r.pid)
        for r in radius_join(q, p, 2.5, bits=bits).collect()
    }
    want = {
        (1, pid)
        for pid, pla, plo in [(10, 89.93, 15.0), (11, 89.93, 180.0)]
        if round(_hav(89.93, 0.0, pla, plo), 6) <= 2.5
    }
    assert (1, 10) in want  # ~2.03 km — the reviewed repro pair
    assert got == want


def test_radius_join_random_differential_seeded(spark):
    """Seeded random differential: 60 queries x 120 points drawn over
    the full globe with extra mass at |lat| > 75 and |lon| > 170 (the
    adversarial bands), three radii, two grids — banding must equal
    brute force EXACTLY every time. Complements the hand-built corner
    tests with breadth."""
    import random

    rng = random.Random(0xC0FFEE)

    def pt():
        r = rng.random()
        if r < 0.3:
            lat = rng.uniform(75, 90) * (1 if rng.random() < 0.5 else -1)
        else:
            lat = rng.uniform(-90, 90)
        if rng.random() < 0.3:
            lon = rng.uniform(170, 180) * (1 if rng.random() < 0.5 else -1)
        else:
            lon = rng.uniform(-180, 180)
        return round(lat, 4), round(lon, 4)

    qpts = [(i, *pt()) for i in range(60)]
    ppts = [(1000 + i, *pt()) for i in range(120)]
    q = spark.createDataFrame(qpts, "qid long, q_lat double, q_lon double")
    p = spark.createDataFrame(ppts, "pid long, p_lat double, p_lon double")
    for radius in (30.0, 400.0, 2500.0):
        want = {
            (qid, pid)
            for qid, qla, qlo in qpts
            for pid, pla, plo in ppts
            if round(_hav(qla, qlo, pla, plo), 6) <= radius
        }
        for bits in (5, 8):
            got_list = [
                (r.qid, r.pid)
                for r in radius_join(q, p, radius, bits=bits).collect()
            ]
            assert set(got_list) == want, (radius, bits)
            assert len(got_list) == len(want), (radius, bits, "dups")
