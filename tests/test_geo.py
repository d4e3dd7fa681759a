"""Geo UDF surface (GeoUtils.java / Geo*.java / GeoBufferAndConvert2S2CellId.java
parity) — pure-python kernel tests + the Spark pandas-UDF surface."""

from __future__ import annotations

import math
import random

import pytest

from linkgraph import geo as G


# --------------------------------------------------------------------------
# WKT
# --------------------------------------------------------------------------


def test_wkt_roundtrip_all_types():
    cases = [
        "POINT (30.5 -10.25)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOINT ((1 2), (3 4))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    ]
    for w in cases:
        assert G.to_wkt(G.parse_wkt(w)) == w


def test_wkt_precision_snap_and_variants():
    # PrecisionModel(1000000): 6 decimals (GeoUtils.java:84)
    assert G.parse_wkt("POINT (1.23456789 0)").data == (1.234568, 0.0)
    # unclosed ring closes; bare multipoint form; EMPTY
    p = G.parse_wkt("POLYGON ((0 0, 1 0, 1 1))")
    assert p.data[0][0] == p.data[0][-1]
    assert G.parse_wkt("MULTIPOINT (1 2, 3 4)").data == [(1.0, 2.0), (3.0, 4.0)]
    assert G.to_wkt(G.parse_wkt("POLYGON EMPTY")) == "POLYGON EMPTY"
    with pytest.raises(ValueError):
        G.parse_wkt("CIRCLE (0 0, 5)")
    with pytest.raises(ValueError):
        G.parse_wkt("POLYGON ((0 0, 1 0")


# --------------------------------------------------------------------------
# distance — exact port of GeoUtils.distance (GeoUtils.java:252-268)
# --------------------------------------------------------------------------


def test_distance_formula_port():
    # 1 degree of longitude at the equator on R=6367000
    d = G.geo_distance("POINT (0 0)", "POINT (1 0)")
    assert d == pytest.approx(math.radians(1) * 6367000.0, rel=1e-12)
    # north-south is latitude-independent in the formula
    assert G.geo_distance("POINT (10 50)", "POINT (10 51)") == pytest.approx(
        math.radians(1) * 6367000.0, rel=1e-12
    )
    # east-west shrinks by cos(mean latitude)
    d60 = G.geo_distance("POINT (0 59.5) ", "POINT (1 60.5)")
    lx = math.radians(1) * 6367000.0 * math.cos(math.radians(60))
    ly = math.radians(1) * 6367000.0
    assert d60 == pytest.approx(math.hypot(lx, ly), rel=1e-12)


def test_distance_nearest_points_cases():
    poly = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    # point inside polygon -> 0 (JTS DistanceOp)
    assert G.geo_distance("POINT (3 3)", poly) == 0.0
    # point inside the HOLE -> distance to the hole boundary (offset from
    # the hole center so the nearest edge is unique: the x=2 edge)
    assert G.geo_distance("POINT (1.6 1.5)", poly) == pytest.approx(
        G.distance_m(1.5, 1.6, 1.5, 2.0), rel=1e-9
    )
    # point to segment projection
    d = G.geo_distance("LINESTRING (10 0, 10 10)", "POINT (12 5)")
    assert d == pytest.approx(G.distance_m(5, 12, 5, 10), rel=1e-9)
    # crossing geometries -> 0
    assert G.geo_distance("LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)") == 0.0
    # bad WKT -> null (GeoDistance.java:38-41)
    assert G.geo_distance("POINT (0 0)", "nonsense") is None


# --------------------------------------------------------------------------
# predicates
# --------------------------------------------------------------------------

POLY = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"


def test_within():
    assert G.geo_within("POINT (3 3)", POLY) is True
    assert G.geo_within("POINT (1.5 1.5)", POLY) is False  # in the hole
    assert G.geo_within("POINT (0 2)", POLY) is False  # boundary is not within
    assert G.geo_within("POINT (9 9)", POLY) is False
    assert G.geo_within("POLYGON ((2.5 2.5, 3 2.5, 3 3, 2.5 2.5))", POLY) is True
    # straddles the boundary
    assert G.geo_within("POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))", POLY) is False
    assert G.geo_within("LINESTRING (0.2 0.2, 0.8 0.5)", POLY) is True
    assert G.geo_within("LINESTRING (3 3, 9 9)", POLY) is False


def test_intersects():
    assert G.geo_is_intersects("POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))", POLY) is True
    assert G.geo_is_intersects("POLYGON ((10 10, 11 10, 11 11, 10 10))", POLY) is False
    # containment without boundary crossing still intersects
    assert G.geo_is_intersects("POLYGON ((2.5 2.5, 3 2.5, 3 3, 2.5 2.5))", POLY) is True
    # point touch on the boundary intersects (but is not within)
    assert G.geo_is_intersects("POINT (0 2)", POLY) is True
    assert G.geo_is_intersects("LINESTRING (-1 2, 9 2)", POLY) is True
    assert G.geo_is_intersects("POINT (0 0)", "POINT (0 0)") is True
    assert G.geo_is_intersects("POINT (0 0)", "POINT (1 0)") is False


# --------------------------------------------------------------------------
# clipping (intersectsShape / intersectsArea)
# --------------------------------------------------------------------------


def test_intersects_shape_squares():
    sq1 = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    sq2 = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
    out = G.parse_wkt(G.geo_intersects_shape(sq1, sq2))
    assert out.kind == "Polygon"
    assert sorted(set(out.data[0])) == [(1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0)]
    # disjoint -> POLYGON EMPTY (GeoUtils.java:287)
    assert (
        G.geo_intersects_shape(sq1, "POLYGON ((5 5, 6 5, 6 6, 5 5))")
        == "POLYGON EMPTY"
    )
    # containment -> the contained ring
    inner = "POLYGON ((0.5 0.5, 1 0.5, 1 1, 0.5 1, 0.5 0.5))"
    assert G.geo_intersects_shape(sq1, inner) == inner


def test_intersects_shape_concave_two_parts():
    # U-shape clipped by a horizontal bar -> the two prongs
    u = "POLYGON ((0 0, 1 0, 1 4, 3 4, 3 0, 4 0, 4 5, 0 5, 0 0))"
    bar = "POLYGON ((-1 2, 6 2, 6 3, -1 3, -1 2))"
    out = G.parse_wkt(G.geo_intersects_shape(u, bar))
    assert out.kind == "MultiPolygon"
    areas = sorted(abs(G._ring_signed_area(p[0])) for p in out.data)
    assert areas == pytest.approx([1.0, 1.0])


def _sutherland_hodgman(subject, clip):
    """Independent convex-clip oracle (clip ring must be convex)."""
    out = list(subject)
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        inp, out = out, []
        if not inp:
            break
        for j in range(len(inp)):
            p, q = inp[j], inp[(j + 1) % len(inp)]
            pin = G._orient(a, b, p) >= 0
            qin = G._orient(a, b, q) >= 0
            if pin:
                out.append(p)
            if pin != qin:
                out.append(G._segment_intersection_point(p, q, a, b))
    return out


def test_clip_fuzz_vs_sutherland_hodgman():
    rng = random.Random(42)
    checked = 0
    for _ in range(60):
        # two random convex polygons (convex hull of random points)
        def hull(cx, cy):
            pts = sorted(
                {(round(cx + rng.uniform(-2, 2), 3), round(cy + rng.uniform(-2, 2), 3)) for _ in range(8)}
            )
            def half(p):
                h = []
                for q in p:
                    while len(h) >= 2 and G._orient(h[-2], h[-1], q) <= 0:
                        h.pop()
                    h.append(q)
                return h
            lower, upper = half(pts), half(list(reversed(pts)))
            return lower[:-1] + upper[:-1]

        h1, h2 = hull(0, 0), hull(rng.uniform(-1, 1), rng.uniform(-1, 1))
        if len(h1) < 3 or len(h2) < 3:
            continue
        expect = _sutherland_hodgman(h1, h2)
        expect_area = abs(G._ring_signed_area(expect + [expect[0]])) if len(expect) >= 3 else 0.0
        got = G._clip_rings(h1 + [h1[0]], h2 + [h2[0]])
        got_area = sum(abs(G._ring_signed_area(r)) for r in got)
        if expect_area < 1e-6:
            assert got_area < 1e-6
        else:
            assert got_area == pytest.approx(expect_area, rel=1e-6), (h1, h2)
        checked += 1
    assert checked >= 40


def test_intersects_area_semantics():
    sq1 = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    sq2 = "POLYGON ((0.5 0, 1.5 0, 1.5 1, 0.5 1, 0.5 0))"
    # half a square degree at the equator; local TM vs sphere surface
    # integral agree to ~0.1% at this size
    a = G.geo_intersects_area(sq1, sq2)
    R, k0 = 6378137.0, 0.9996
    expect = (math.radians(0.5) * R * k0) * (math.radians(1.0) * R * k0)
    assert a == pytest.approx(expect, rel=5e-3)
    # disjoint -> -1.0; non-polygon -> 0.0 (GeoUtils.java:302-313)
    assert G.geo_intersects_area(sq1, "POLYGON ((5 5, 6 5, 6 6, 5 5))") == -1.0
    assert G.geo_intersects_area("POINT (0.5 0.5)", sq1) == 0.0


# --------------------------------------------------------------------------
# S2 cell ids
# --------------------------------------------------------------------------


def _hilbert_recursive(face, i, j):
    """Independent recursive-descent construction of the 60-bit Hilbert
    position using only _POS_TO_IJ (the iterative production code uses
    the inverted table) — catches table/inversion mistakes."""
    pos = 0
    orientation = face & 1
    for k in range(G._MAX_LEVEL - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        for p in range(4):
            if G._POS_TO_IJ[orientation][p] == ij:
                break
        pos = (pos << 2) | p
        orientation ^= G._POS_TO_ORIENTATION[p]
    return (face << 61) | (pos << 1) | 1


def test_s2_leaf_matches_independent_hilbert():
    rng = random.Random(7)
    for _ in range(100):
        lat, lng = rng.uniform(-89, 89), rng.uniform(-180, 180)
        face, u, v = G._xyz_to_face_uv(*G._latlng_to_xyz(lat, lng))
        i = min(G._MAX_SIZE - 1, max(0, int(math.floor(G._uv_to_st(u) * G._MAX_SIZE))))
        j = min(G._MAX_SIZE - 1, max(0, int(math.floor(G._uv_to_st(v) * G._MAX_SIZE))))
        assert G.cellid_from_face_ij(face, i, j) == _hilbert_recursive(face, i, j)


def test_s2_roundtrip_and_hierarchy():
    rng = random.Random(11)
    for _ in range(100):
        lat, lng = rng.uniform(-89, 89), rng.uniform(-180, 180)
        leaf = G.cellid_from_latlng(lat, lng)
        assert G.cellid_level(leaf) == 30
        la, ln = G.cellid_to_latlng(leaf)
        assert abs(la - lat) < 1e-5 and abs(ln - lng) < 2e-5 / max(
            0.02, math.cos(math.radians(lat))
        )
        for level in (0, 5, 14, 29):
            parent = G.cellid_parent(leaf, level)
            assert G.cellid_level(parent) == level
            # direct construction at that level agrees with parent-of-leaf
            assert G.cellid_from_latlng(lat, lng, level) == parent
            # token round-trip
            assert G.token_to_cellid(G.cellid_to_token(parent)) == parent


def test_s2_face_uv_tables_consistent():
    # xyz -> (face, u, v) -> xyz must return a colinear vector, all faces
    rng = random.Random(3)
    for _ in range(200):
        x, y, z = (rng.uniform(-1, 1) for _ in range(3))
        n = math.sqrt(x * x + y * y + z * z)
        if n < 1e-6:
            continue
        x, y, z = x / n, y / n, z / n
        face, u, v = G._xyz_to_face_uv(x, y, z)
        bx, by, bz = G._face_uv_to_xyz(face, u, v)
        bn = math.sqrt(bx * bx + by * by + bz * bz)
        assert (bx / bn, by / bn, bz / bn) == pytest.approx((x, y, z), abs=1e-12)
    # st <-> uv quadratic projection round trip
    for s in (0.0, 0.1, 0.5, 0.77, 1.0):
        assert G._uv_to_st(G._st_to_uv(s)) == pytest.approx(s, abs=1e-12)


def test_s2_covering():
    # bare point: its level-14 ancestor cell only
    toks = G.s2_covering_tokens("POINT (116.397 39.909)")
    assert len(toks) == 1
    assert G.cellid_level(G.token_to_cellid(toks[0])) == 14
    # buffered point: a disc of cells around it, containing the center
    buf = G.s2_covering_tokens("POINT (116.397 39.909)", 1000.0)
    assert toks[0] in buf
    # level-14 cells are ~600 m: a 1 km-radius disc covers ~10-40
    assert 6 <= len(buf) <= 60
    assert buf == sorted(buf) and len(set(buf)) == len(buf)
    assert all(G.cellid_level(G.token_to_cellid(t)) == 14 for t in buf)
    # polygon covering includes every vertex cell and interior samples
    poly = "POLYGON ((116.39 39.90, 116.41 39.90, 116.41 39.92, 116.39 39.92, 116.39 39.90))"
    cov = G.s2_covering_tokens(poly)
    for x, y in G.parse_wkt(poly).points():
        assert G.cellid_to_token(G.cellid_from_latlng(y, x, 14)) in cov
    assert len(cov) >= 4
    # bigger buffer -> superset-or-equal count
    assert len(G.s2_covering_tokens(poly, 2000.0)) > len(cov)
    # determinism
    assert cov == G.s2_covering_tokens(poly)


def test_meter_to_degree_port():
    # GeoUtils.java:120-125
    assert G.meter_to_degree(0.0, 40075017.0 / 360.0) == pytest.approx(1.0)
    assert G.meter_to_degree(60.0, 100.0) == pytest.approx(
        100.0 / (40075017.0 * 0.5) * 360.0
    )


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------


def test_geo_udfs_in_spark(spark):
    from pyspark.sql import functions as F

    from linkgraph import ops
    from linkgraph.functions import SCALARS

    df = spark.createDataFrame(
        [
            ("a", "POINT (0 0)", "POINT (1 0)"),
            ("b", "POINT (3 3)", POLY),
            ("c", "not wkt", "POINT (0 0)"),
            ("d", None, "POINT (0 0)"),
        ],
        "id string, g1 string, g2 string",
    )
    out = (
        df.select(
            "id",
            SCALARS["geo_distance"](F.col("g1"), F.col("g2")).alias("d"),
            SCALARS["geo_within"](F.col("g1"), F.col("g2")).alias("w"),
            SCALARS["geo_is_intersects"](F.col("g1"), F.col("g2")).alias("x"),
        )
        .orderBy("id")
        .collect()
    )
    assert out[0]["d"] == pytest.approx(math.radians(1) * 6367000.0)
    assert out[1]["d"] == 0.0 and out[1]["w"] is True and out[1]["x"] is True
    assert out[2]["d"] is None and out[3]["d"] is None  # null on bad WKT

    # UDTF through linked_expand: one row per covering cell token
    pts = spark.createDataFrame(
        [("p1", "POINT (116.397 39.909)", 1000.0), ("p2", "", 500.0)],
        "id string, wkt string, meters double",
    )
    linked = ops.linked_expand(
        pts, "geo_buffer_and_convert_2_s2CellId", F.col("wkt"), F.col("meters"), out="cell"
    )
    rows = linked.collect()
    assert all(r["id"] == "p1" for r in rows)  # empty-WKT row dropped
    assert sorted({r["cell"] for r in rows}) == G.s2_covering_tokens(
        "POINT (116.397 39.909)", 1000.0
    )


def test_geo_functions_from_gql_rules(spark):
    """The reference calls geo UDFs inside rule expressions
    (GeoDistance.java et al. resolve through UdfMng at rule-eval time);
    here the GQL front-end resolves them from functions.SCALARS, with
    literal WKT args lifted to columns (a raw str would otherwise be
    read as a column name by the pandas UDF)."""
    from linkgraph.gql import PropertyGraph, compile_query

    verts = spark.createDataFrame(
        [
            (1, "POINT (0 0)"),
            (2, "POINT (0.5 0)"),
            (3, "POINT (30 30)"),
            (4, "POINT (0 0.25)"),
        ],
        "vid bigint, loc string",
    )
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "src bigint, dst bigint"
    )
    g = PropertyGraph({"V": verts}, {"E": edges})
    # column-vs-column distance in a WHERE
    got = {
        r["b"]
        for r in compile_query(
            "MATCH (a)-[]->(b) WHERE geo_distance(a.loc, b.loc) < 60000 "
            "RETURN b.vid AS b",
            g,
        ).collect()
    }
    assert got == {2, 4}
    # literal WKT arg (the common rule shape: containment in a fixed zone)
    got2 = {
        r["b"]
        for r in compile_query(
            "MATCH (a)-[]->(b) WHERE geo_within(b.loc, "
            "'POLYGON ((-1 -1, 1 -1, 1 1, -1 1, -1 -1))') RETURN b.vid AS b",
            g,
        ).collect()
    }
    assert got2 == {2, 4}


def test_s2_covering_bare_linestring():
    # a zero-area geometry emits the cells its segments pass through
    # (segment-walk sampling; the bbox grid alone can't hit a line)
    toks = G.s2_covering_tokens("LINESTRING (116.39 39.90, 116.45 39.90)")
    # ~6.7 km east-west over ~600 m cells
    assert 8 <= len(toks) <= 30
    assert toks == sorted(toks)
    ends = {
        G.cellid_to_token(G.cellid_from_latlng(39.90, lng, 14))
        for lng in (116.39, 116.45)
    }
    assert ends <= set(toks)


def test_within_self_and_hole_topology():
    # review regression: within(g, g) on a polygon whose centroid falls
    # in its own hole (all vertex/midpoint probes sit ON the boundary)
    w = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    assert G.geo_within(w, w) is True
    # a hole of g2 poking into g1's interior breaks containment even
    # with zero edge crossings
    holed = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))"
    solid = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    assert G.geo_within(solid, holed) is False
    assert G.geo_within(holed, solid) is True
    # interior-point helper lands strictly inside, outside holes
    ip = G._interior_point(G.parse_wkt(w).data)
    assert G._point_in_polygon(ip, G.parse_wkt(w).data) == 2


def test_spark_kernels_share_geo_module_logic(spark):
    # review regression: the pandas-UDF kernels delegate to the same
    # Geom-level helpers the pure-python surface uses
    from pyspark.sql import functions as F

    from linkgraph.functions import SCALARS

    sq1 = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    sq2 = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
    df = spark.createDataFrame([(sq1, sq2)], "g1 string, g2 string")
    row = df.select(
        SCALARS["geo_intersects_shape"](F.col("g1"), F.col("g2")).alias("s"),
        SCALARS["geo_intersects_area"](F.col("g1"), F.col("g2")).alias("a"),
    ).first()
    assert row["s"] == G.geo_intersects_shape(sq1, sq2)
    assert row["a"] == pytest.approx(G.geo_intersects_area(sq1, sq2))

    # NULL meters must fail loudly (the reference throws before its
    # catch-and-forward-empty block)
    from linkgraph import ops

    pts = spark.createDataFrame(
        [("p1", "POINT (1 1)", None)], "id string, wkt string, meters double"
    )
    with pytest.raises(Exception, match="distance should not empty"):
        ops.linked_expand(
            pts, "geo_buffer_and_convert_2_s2CellId", F.col("wkt"), F.col("meters")
        ).collect()

    # randomLong spans negatives (full signed 64-bit, unlike rand*2^62)
    from linkgraph.functions import SCALARS as S

    vals = [
        r["r"]
        for r in spark.range(200).select(S["randomLong"]().alias("r")).collect()
    ]
    assert any(v < 0 for v in vals) and any(v > 0 for v in vals)
    assert len(set(vals)) > 150
