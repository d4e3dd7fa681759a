"""Geo UDF surface: WKT geometries, planar-degree predicates, the
reference's exact distance formula, polygon clipping, and S2 cell ids.

Reference parity (the last SURVEY-scoped-out group, now in scope):
  /root/reference/reasoner/udf/src/main/java/com/antgroup/openspg/reasoner/udf/utils/GeoUtils.java
    - fromWKT/toWKT via JTS WKTReader with PrecisionModel(1000000)
      (GeoUtils.java:84-86 — scale 1e6, i.e. coordinates snapped to six
      decimal places; the code comment says seven but the model says six,
      we follow the code) -> parse_wkt/to_wkt snap to 6 decimals.
    - distance(Geometry, Geometry) (GeoUtils.java:236-243): JTS
      DistanceOp nearest points in PLANAR lng/lat degree space, then the
      equirectangular formula distance(lat1,lng1,lat2,lng2)
      (GeoUtils.java:252-268, EARTH_RADIUS=6367000.0) -> geo_distance.
    - isIntersects/within -> JTS predicates (GeoUtils.java:276-337)
      -> intersects()/within() (planar, boundary-inclusive intersects,
      boundary-exclusive within, matching DE-9IM on simple shapes).
    - intersectsShape -> "POLYGON EMPTY" when disjoint else intersection
      WKT (GeoUtils.java:284-294) -> intersects_shape (Greiner-Hormann
      clipping on exterior rings).
    - intersectsArea -> -1.0 when disjoint, 0.0 unless both Polygons,
      else area in an AUTO:42001 local transverse-Mercator projection
      (GeoUtils.java:300-327) -> intersects_area (spherical TM about the
      first polygon's centroid; same shape, spherical-vs-ellipsoidal
      radius differs <0.5% — documented approximation).
    - buffer = meterToDegree(centroid lat) planar degree buffer
      (GeoUtils.java:120-133) -> covering tests membership by planar
      degree distance <= buffer instead of materializing the buffered
      ring (identical region, no ring construction).
  .../builtin/udf/GeoDistance.java:32 (geo_distance — null on bad WKT),
  GeoWithin.java, GeoIsIntersects.java, GeoIntersectsShape.java,
  GeoIntersectsArea.java (names + null behavior)
  .../builtin/udtf/GeoBufferAndConvert2S2CellId.java:31-87
  (geo_buffer_and_convert_2_s2CellId: WKT + meters -> level-14 S2 cell
  tokens; empty list on parse failure, min=max level 14, max 40000
  cells — GeoUtils.java:69-75).

S2 cell ids follow the public s2geometry cell-id construction
(lat/lng -> cube face + (u,v) -> quadratic (s,t) -> 30-bit (i,j) ->
Hilbert position; id = face(3 bits) . hilbert(60 bits) . 1): see the
S2 geometry library docs ("S2 Cell Hierarchy"). Tokens are the
16-hex-digit id with trailing zeros stripped. Round-trip, hierarchy,
and an independently-coded Hilbert cross-check live in
tests/test_geo.py; token-level interop with Google's library cannot be
verified in this sandbox (no s2 package) and is documented as such.

Everything here is per-row scalar geometry math, so the Spark surface
is Arrow-batched pandas UDFs (the reference's UDFs are per-row JVM
calls; Arrow batching is the Spark-idiomatic equivalent) with a
per-batch parse memo so a constant literal polygon is parsed once per
batch, not once per row.
"""

from __future__ import annotations

import math
import re
from typing import Iterable

EARTH_RADIUS = 6367000.0  # GeoUtils.java:76
EARTH_CIRCUMFERENCE = 40075017.0  # GeoUtils.java:79
S2_BEST_LEVEL = 14  # GeoUtils.java:70
S2_MAX_CELL_IDS = 40000  # GeoUtils.java:73
_SNAP = 1_000_000.0  # JTS PrecisionModel(1000000), GeoUtils.java:84

Coord = tuple[float, float]  # (x=lng, y=lat)


# --------------------------------------------------------------------------
# WKT
# --------------------------------------------------------------------------


class Geom:
    """Parsed WKT geometry. kind in {Point, LineString, Polygon,
    MultiPoint, MultiPolygon}; polygons hold [exterior, *holes] rings
    (closed: first == last)."""

    __slots__ = ("kind", "data")

    def __init__(self, kind: str, data):
        self.kind = kind
        self.data = data

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Geom({self.kind}, {self.data!r})"

    # ---- decompositions used by the predicates/distance kernels ----
    def points(self) -> list[Coord]:
        if self.kind == "Point":
            return [self.data]
        if self.kind == "MultiPoint":
            return list(self.data)
        if self.kind == "LineString":
            return list(self.data)
        if self.kind == "Polygon":
            return [p for ring in self.data for p in ring[:-1]]
        if self.kind == "MultiPolygon":
            return [p for poly in self.data for ring in poly for p in ring[:-1]]
        raise AssertionError(self.kind)

    def segments(self) -> list[tuple[Coord, Coord]]:
        segs: list[tuple[Coord, Coord]] = []
        if self.kind == "LineString":
            segs.extend(zip(self.data, self.data[1:]))
        elif self.kind == "Polygon":
            for ring in self.data:
                segs.extend(zip(ring, ring[1:]))
        elif self.kind == "MultiPolygon":
            for poly in self.data:
                for ring in poly:
                    segs.extend(zip(ring, ring[1:]))
        return segs

    def polygons(self) -> list[list[list[Coord]]]:
        if self.kind == "Polygon":
            return [self.data]
        if self.kind == "MultiPolygon":
            return list(self.data)
        return []

    def bbox(self) -> tuple[float, float, float, float]:
        pts = self.points()
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        return min(xs), min(ys), max(xs), max(ys)

    def centroid(self) -> Coord:
        """JTS-style centroid: area centroid for polygons, length
        centroid for lines, mean for points."""
        if self.kind in ("Point",):
            return self.data
        if self.kind == "MultiPoint":
            xs = [p[0] for p in self.data]
            ys = [p[1] for p in self.data]
            return (sum(xs) / len(xs), sum(ys) / len(ys))
        if self.kind == "LineString":
            sx = sy = tot = 0.0
            for (x1, y1), (x2, y2) in self.segments():
                ln = math.hypot(x2 - x1, y2 - y1)
                sx += (x1 + x2) / 2 * ln
                sy += (y1 + y2) / 2 * ln
                tot += ln
            if tot == 0:
                return self.data[0]
            return (sx / tot, sy / tot)
        # polygon(s): signed-area-weighted; holes subtract via ring
        # orientation after the shoelace (holes parsed as-is keep their
        # sign contribution only if wound oppositely; we normalize)
        sx = sy = tot = 0.0
        for poly in self.polygons():
            for idx, ring in enumerate(poly):
                a = _ring_signed_area(ring)
                a = abs(a) * (1 if idx == 0 else -1)
                cx, cy = _ring_area_centroid(ring)
                sx += cx * a
                sy += cy * a
                tot += a
        if tot == 0:
            return self.points()[0]
        return (sx / tot, sy / tot)


def _snap(v: float) -> float:
    return round(v * _SNAP) / _SNAP


_NUM = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"


def _parse_coords(body: str) -> list[Coord]:
    out = []
    for pair in body.split(","):
        nums = re.findall(_NUM, pair)
        if len(nums) < 2:
            raise ValueError(f"bad coordinate {pair!r}")
        out.append((_snap(float(nums[0])), _snap(float(nums[1]))))
    return out


def _split_groups(body: str) -> list[str]:
    """Split a parenthesized group list '( .. ), ( .. )' at depth 0."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    if depth != 0:
        raise ValueError("unbalanced parentheses in WKT")
    return groups


def _close_ring(ring: list[Coord]) -> list[Coord]:
    if len(ring) < 3:
        raise ValueError("ring needs >= 3 points")
    if ring[0] != ring[-1]:
        ring = ring + [ring[0]]
    return ring


def parse_wkt(s: str) -> Geom:
    """Parse the WKT subset GeoUtils handles (GeoUtils.java:53-67):
    POINT, LINESTRING, POLYGON, MULTIPOINT, MULTIPOLYGON (+ EMPTY).
    Coordinates snap to 6 decimals (PrecisionModel(1000000))."""
    if s is None:
        raise ValueError("null WKT")
    s = s.strip()
    m = re.match(r"(?is)^([a-z]+)\s*(EMPTY|\(.*\))$", s)
    if not m:
        raise ValueError(f"cannot parse WKT {s[:50]!r}")
    kind_raw, body = m.group(1).upper(), m.group(2)
    if body.upper() == "EMPTY":
        kinds = {
            "POINT": "Point",
            "LINESTRING": "LineString",
            "POLYGON": "Polygon",
            "MULTIPOINT": "MultiPoint",
            "MULTIPOLYGON": "MultiPolygon",
        }
        if kind_raw not in kinds:
            raise ValueError(f"unsupported WKT type {kind_raw}")
        return Geom(kinds[kind_raw], [] if kind_raw != "POINT" else None)
    inner = body[1:-1].strip()
    if kind_raw == "POINT":
        pts = _parse_coords(inner)
        if len(pts) != 1:
            raise ValueError("POINT takes one coordinate")
        return Geom("Point", pts[0])
    if kind_raw == "LINESTRING":
        pts = _parse_coords(inner)
        if len(pts) < 2:
            raise ValueError("LINESTRING needs >= 2 points")
        return Geom("LineString", pts)
    if kind_raw == "POLYGON":
        rings = [_close_ring(_parse_coords(g)) for g in _split_groups(inner)]
        if not rings:
            raise ValueError("POLYGON needs >= 1 ring")
        return Geom("Polygon", rings)
    if kind_raw == "MULTIPOINT":
        # both MULTIPOINT ((1 2), (3 4)) and MULTIPOINT (1 2, 3 4)
        if "(" in inner:
            pts = [pt for g in _split_groups(inner) for pt in _parse_coords(g)]
        else:
            pts = _parse_coords(inner)
        return Geom("MultiPoint", pts)
    if kind_raw == "MULTIPOLYGON":
        polys = []
        for g in _split_groups(inner):
            rings = [_close_ring(_parse_coords(r)) for r in _split_groups(g)]
            polys.append(rings)
        return Geom("MultiPolygon", polys)
    raise ValueError(f"unsupported WKT type {kind_raw}")


def _fmt(v: float) -> str:
    v = _snap(v)
    if v == int(v):
        return str(int(v))
    return repr(v)


def to_wkt(g: Geom) -> str:
    def coords(pts: Iterable[Coord]) -> str:
        return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)

    if g.kind == "Point":
        if g.data is None:
            return "POINT EMPTY"
        return f"POINT ({coords([g.data])})"
    if not g.data:
        return f"{g.kind.upper()} EMPTY"
    if g.kind == "LineString":
        return f"LINESTRING ({coords(g.data)})"
    if g.kind == "MultiPoint":
        return "MULTIPOINT (" + ", ".join(f"({coords([p])})" for p in g.data) + ")"
    if g.kind == "Polygon":
        return "POLYGON (" + ", ".join(f"({coords(r)})" for r in g.data) + ")"
    if g.kind == "MultiPolygon":
        return (
            "MULTIPOLYGON ("
            + ", ".join(
                "(" + ", ".join(f"({coords(r)})" for r in poly) + ")" for poly in g.data
            )
            + ")"
        )
    raise AssertionError(g.kind)


# --------------------------------------------------------------------------
# planar primitives (degree space — JTS computes in coordinate space too)
# --------------------------------------------------------------------------

_EPS = 1e-12


def _ring_signed_area(ring: list[Coord]) -> float:
    a = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        a += x1 * y2 - x2 * y1
    return a / 2.0


def _ring_area_centroid(ring: list[Coord]) -> Coord:
    a = _ring_signed_area(ring)
    if abs(a) < _EPS:
        xs = [p[0] for p in ring[:-1]]
        ys = [p[1] for p in ring[:-1]]
        return (sum(xs) / len(xs), sum(ys) / len(ys))
    cx = cy = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        w = x1 * y2 - x2 * y1
        cx += (x1 + x2) * w
        cy += (y1 + y2) * w
    return (cx / (6 * a), cy / (6 * a))


def _seg_closest_point(p: Coord, a: Coord, b: Coord) -> Coord:
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    den = dx * dx + dy * dy
    if den < _EPS:
        return a
    t = ((px - ax) * dx + (py - ay) * dy) / den
    t = max(0.0, min(1.0, t))
    return (ax + t * dx, ay + t * dy)


def _seg_seg_nearest(a: Coord, b: Coord, c: Coord, d: Coord) -> tuple[Coord, Coord]:
    """Nearest point pair between segments ab and cd (planar)."""
    if _segments_intersect(a, b, c, d):
        p = _segment_intersection_point(a, b, c, d)
        return p, p
    best = None
    for p, (u, v) in ((a, (c, d)), (b, (c, d))):
        q = _seg_closest_point(p, u, v)
        d2 = (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
        if best is None or d2 < best[0]:
            best = (d2, p, q)
    for p, (u, v) in ((c, (a, b)), (d, (a, b))):
        q = _seg_closest_point(p, u, v)
        d2 = (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
        if best is None or d2 < best[0]:
            best = (d2, q, p)
    return best[1], best[2]


def _orient(a: Coord, b: Coord, c: Coord) -> float:
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _on_segment(a: Coord, b: Coord, p: Coord) -> bool:
    if abs(_orient(a, b, p)) > _EPS * max(1.0, abs(a[0]) + abs(b[0]) + abs(a[1]) + abs(b[1])):
        return False
    return (
        min(a[0], b[0]) - _EPS <= p[0] <= max(a[0], b[0]) + _EPS
        and min(a[1], b[1]) - _EPS <= p[1] <= max(a[1], b[1]) + _EPS
    )


def _segments_intersect(a: Coord, b: Coord, c: Coord, d: Coord) -> bool:
    o1, o2 = _orient(a, b, c), _orient(a, b, d)
    o3, o4 = _orient(c, d, a), _orient(c, d, b)
    if ((o1 > 0) != (o2 > 0)) and ((o3 > 0) != (o4 > 0)) and o1 != 0 and o2 != 0 and o3 != 0 and o4 != 0:
        return True
    return (
        _on_segment(a, b, c)
        or _on_segment(a, b, d)
        or _on_segment(c, d, a)
        or _on_segment(c, d, b)
    )


def _segment_intersection_point(a: Coord, b: Coord, c: Coord, d: Coord) -> Coord:
    x1, y1 = a
    x2, y2 = b
    x3, y3 = c
    x4, y4 = d
    den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    if abs(den) < _EPS:  # collinear touch — return an endpoint on both
        for p in (c, d):
            if _on_segment(a, b, p):
                return p
        return a
    t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
    return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))


def _point_in_ring(p: Coord, ring: list[Coord]) -> int:
    """2 = strictly inside, 1 = on boundary, 0 = outside (ray cast)."""
    x, y = p
    inside = False
    for a, b in zip(ring, ring[1:]):
        if _on_segment(a, b, p):
            return 1
        (x1, y1), (x2, y2) = a, b
        if (y1 > y) != (y2 > y):
            xi = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if xi > x:
                inside = not inside
    return 2 if inside else 0


def _point_in_polygon(p: Coord, rings: list[list[Coord]]) -> int:
    """2/1/0 vs a polygon with holes."""
    r = _point_in_ring(p, rings[0])
    if r != 2:
        return r
    for hole in rings[1:]:
        h = _point_in_ring(p, hole)
        if h == 2:
            return 0
        if h == 1:
            return 1
    return 2


def _point_in_geom(p: Coord, g: Geom) -> int:
    if g.kind in ("Point", "MultiPoint"):
        for q in g.points():
            if abs(q[0] - p[0]) < _EPS and abs(q[1] - p[1]) < _EPS:
                return 1
        return 0
    if g.kind == "LineString":
        for a, b in g.segments():
            if _on_segment(a, b, p):
                return 1
        return 0
    best = 0
    for poly in g.polygons():
        best = max(best, _point_in_polygon(p, poly))
    return best


# --------------------------------------------------------------------------
# predicates + distance (GeoUtils.distance / isIntersects / within)
# --------------------------------------------------------------------------


def intersects(g1: Geom, g2: Geom) -> bool:
    """JTS Geometry.intersects analog: boundaries touch/cross, or one
    geometry lies inside the other (GeoUtils.java:276-281)."""
    if _is_empty(g1) or _is_empty(g2):
        return False
    for a, b in g1.segments():
        for c, d in g2.segments():
            if _segments_intersect(a, b, c, d):
                return True
    # containment / point cases: any representative point inside the other
    for p in g1.points():
        if _point_in_geom(p, g2):
            return True
    for p in g2.points():
        if _point_in_geom(p, g1):
            return True
    return False


def _interior_point(rings: list[list[Coord]]) -> Coord | None:
    """A point strictly inside a polygon-with-holes (JTS
    InteriorPointArea analog): scan a horizontal line between two
    distinct vertex ys, take the midpoint of an inside span."""
    ys = sorted({y for ring in rings for (_, y) in ring})
    for y1, y2 in zip(ys, ys[1:]):
        ymid = (y1 + y2) / 2
        xs = []
        for ring in rings:
            for (ax, ay), (bx, by) in zip(ring, ring[1:]):
                if (ay > ymid) != (by > ymid):
                    xs.append(ax + (ymid - ay) * (bx - ax) / (by - ay))
        xs.sort()
        for xa, xb in zip(xs[0::2], xs[1::2]):
            p = ((xa + xb) / 2, ymid)
            if _point_in_polygon(p, rings) == 2:
                return p
    return None


def within(g1: Geom, g2: Geom) -> bool:
    """JTS within (GeoUtils.java:335-337): every point of g1 in g2 and
    g1's interior meets g2's interior. Boundary-only contact is not
    within (a point ON a polygon edge is not within it)."""
    if _is_empty(g1) or _is_empty(g2):
        return False
    if g1.kind in ("Point", "MultiPoint"):
        flags = [_point_in_geom(p, g2) for p in g1.points()]
        if any(f == 0 for f in flags):
            return False
        if g2.polygons():
            return any(f == 2 for f in flags)
        return True  # point-on-line / point-on-point: interiors coincide
    if not g2.polygons():
        return False  # line/polygon within a line: out of scope (JTS: needs exact overlay)
    # every vertex inside-or-boundary, no proper edge crossing, and at
    # least one strictly-interior probe
    for p in g1.points():
        if _point_in_geom(p, g2) == 0:
            return False
    for a, b in g1.segments():
        for c, d in g2.segments():
            if _proper_crossing(a, b, c, d):
                return False
        mid = ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2)
        if _point_in_geom(mid, g2) == 0:
            return False
    if g1.polygons():
        # a hole of g2 poking into g1's interior (no edge crossing
        # needed) breaks containment: g1 claims area g2 lacks
        for poly2 in g2.polygons():
            for hole in poly2[1:]:
                for hv in hole[:-1]:
                    if any(
                        _point_in_polygon(hv, poly1) == 2 for poly1 in g1.polygons()
                    ):
                        return False
        # strict-interior probe: a TRUE interior point of g1 (vertices,
        # edge midpoints, and the centroid can all sit on g2's boundary
        # or in shared holes — e.g. within(g, g) on a polygon whose
        # centroid falls in its own hole)
        for poly1 in g1.polygons():
            ip = _interior_point(poly1)
            if ip is not None and _point_in_geom(ip, g2) == 2:
                return True
        return False
    probes = g1.points() + [
        ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2) for a, b in g1.segments()
    ]
    return any(_point_in_geom(p, g2) == 2 for p in probes)


def _proper_crossing(a: Coord, b: Coord, c: Coord, d: Coord) -> bool:
    o1, o2 = _orient(a, b, c), _orient(a, b, d)
    o3, o4 = _orient(c, d, a), _orient(c, d, b)
    return (o1 > _EPS) != (o2 > -_EPS) and (o3 > _EPS) != (o4 > -_EPS) and (
        (o1 > _EPS) != (o2 > _EPS)
    ) and ((o3 > _EPS) != (o4 > _EPS)) and min(abs(o1), abs(o2), abs(o3), abs(o4)) > _EPS


def _is_empty(g: Geom) -> bool:
    if g.kind == "Point":
        return g.data is None
    return not g.data


def distance_m(lat1: float, lng1: float, lat2: float, lng2: float) -> float:
    """Exact port of GeoUtils.distance(lat1,lng1,lat2,lng2)
    (GeoUtils.java:252-268): equirectangular east-west/north-south
    right triangle on EARTH_RADIUS=6367000."""
    dx = lng1 - lng2
    dy = lat1 - lat2
    b = (lat1 + lat2) / 2.0
    lx = math.radians(dx) * EARTH_RADIUS * math.cos(math.radians(b))
    ly = EARTH_RADIUS * math.radians(dy)
    return math.sqrt(lx * lx + ly * ly)


def nearest_points(g1: Geom, g2: Geom) -> tuple[Coord, Coord]:
    """JTS DistanceOp.nearestPoints analog in planar degree space."""
    if intersects(g1, g2):
        # JTS returns a point of the (non-empty) intersection for both
        for p in g1.points():
            if _point_in_geom(p, g2):
                return p, p
        for p in g2.points():
            if _point_in_geom(p, g1):
                return p, p
        for a, b in g1.segments():
            for c, d in g2.segments():
                if _segments_intersect(a, b, c, d):
                    p = _segment_intersection_point(a, b, c, d)
                    return p, p
    best: tuple[float, Coord, Coord] | None = None

    def consider(p: Coord, q: Coord):
        nonlocal best
        d2 = (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
        if best is None or d2 < best[0]:
            best = (d2, p, q)

    s1, s2 = g1.segments(), g2.segments()
    if s1 and s2:
        for a, b in s1:
            for c, d in s2:
                p, q = _seg_seg_nearest(a, b, c, d)
                consider(p, q)
    elif s1:
        for q in g2.points():
            for a, b in s1:
                consider(_seg_closest_point(q, a, b), q)
    elif s2:
        for p in g1.points():
            for c, d in s2:
                consider(p, _seg_closest_point(p, c, d))
    else:
        for p in g1.points():
            for q in g2.points():
                consider(p, q)
    assert best is not None
    return best[1], best[2]


def geo_distance(wkt1: str, wkt2: str) -> float | None:
    """geo_distance(wkt, wkt) -> meters; None on parse error
    (GeoDistance.java:33-42)."""
    try:
        g1, g2 = parse_wkt(wkt1), parse_wkt(wkt2)
        (x1, y1), (x2, y2) = nearest_points(g1, g2)
        return distance_m(y1, x1, y2, x2)
    except Exception:
        return None


def geo_within(wkt1: str, wkt2: str) -> bool | None:
    try:
        return within(parse_wkt(wkt1), parse_wkt(wkt2))
    except Exception:
        return None


def geo_is_intersects(wkt1: str, wkt2: str) -> bool | None:
    try:
        return intersects(parse_wkt(wkt1), parse_wkt(wkt2))
    except Exception:
        return None


# --------------------------------------------------------------------------
# polygon clipping (intersectsShape / intersectsArea)
# --------------------------------------------------------------------------


def _clip_rings(
    subject: list[Coord], clip: list[Coord], _depth: int = 0
) -> list[list[Coord]]:
    """Greiner-Hormann intersection of two simple rings (exterior rings,
    CCW-normalized open form). Returns a list of closed result rings.
    Degenerate inputs (vertex exactly on the other ring's edge, shared
    edges) are retried with the clip ring nudged ~1e-9 degrees — three
    orders of magnitude below the 6-decimal precision grid, the same
    snap-before-overlay discipline JTS's precision model applies."""
    a = _normalize_open(subject)
    b = _normalize_open(clip)
    inter_ab: dict[int, list[tuple[float, Coord]]] = {}
    inter_ba: dict[int, list[tuple[float, Coord]]] = {}
    found = False
    for i in range(len(a)):
        a1, a2 = a[i], a[(i + 1) % len(a)]
        for j in range(len(b)):
            b1, b2 = b[j], b[(j + 1) % len(b)]
            if not _proper_crossing(a1, a2, b1, b2):
                continue
            p = _segment_intersection_point(a1, a2, b1, b2)
            ta = _param_along(a1, a2, p)
            tb = _param_along(b1, b2, p)
            inter_ab.setdefault(i, []).append((ta, p))
            inter_ba.setdefault(j, []).append((tb, p))
            found = True
    if not found:
        # no proper crossings: containment or disjoint
        if all(_point_in_ring(p, _closed(b)) for p in a):
            return [_closed(a)]
        if all(_point_in_ring(p, _closed(a)) for p in b):
            return [_closed(b)]
        # degenerate partial overlap (vertices exactly ON the other
        # ring's edges swallow the crossings) -> nudge and retry
        if _depth < 2 and (
            any(_point_in_ring(p, _closed(b)) == 2 for p in a)
            or any(_point_in_ring(p, _closed(a)) == 2 for p in b)
        ):
            return _clip_rings(_closed(a), _perturb(b, _depth), _depth + 1)
        return []
    # build augmented vertex cycles with cross-links
    ring_a = _augment(a, inter_ab)
    ring_b = _augment(b, inter_ba)
    link_a = {pt: k for k, (pt, is_x) in enumerate(ring_a) if is_x}
    link_b = {pt: k for k, (pt, is_x) in enumerate(ring_b) if is_x}
    closed_b = _closed(b)
    results: list[list[Coord]] = []
    visited: set[tuple[int, int]] = set()
    for start, (pt, is_x) in enumerate(ring_a):
        if not is_x or (0, start) in visited:
            continue
        # entry point: the A-edge after pt dives into B
        nxt = ring_a[(start + 1) % len(ring_a)][0]
        mid = ((pt[0] + nxt[0]) / 2, (pt[1] + nxt[1]) / 2)
        if _point_in_ring(mid, closed_b) != 2:
            continue
        out: list[Coord] = []
        side, idx = 0, start
        rings = (ring_a, ring_b)
        links = (link_a, link_b)
        guard = 4 * (len(ring_a) + len(ring_b))
        while guard > 0:
            guard -= 1
            if (side, idx) in visited and out:
                break
            visited.add((side, idx))
            cur_pt, cur_x = rings[side][idx]
            if out and cur_pt == out[0]:
                break
            out.append(cur_pt)
            if cur_x and out[-1] != out[0]:
                # at a crossing decide whether to switch rings: follow
                # whichever outgoing edge stays inside the OTHER polygon
                if _stay_inside(rings[side], idx, closed_b if side == 0 else _closed(a)):
                    idx = (idx + 1) % len(rings[side])
                else:
                    other = 1 - side
                    idx = (links[other][cur_pt] + 1) % len(rings[other])
                    visited.add((other, links[other][cur_pt]))
                    side = other
            else:
                idx = (idx + 1) % len(rings[side])
        if len(out) >= 3:
            results.append(out + [out[0]])
    if not results and _depth < 2:
        # traversal degenerated (crossings at shared vertices) -> retry
        return _clip_rings(_closed(a), _perturb(b, _depth), _depth + 1)
    return results


def _perturb(ring_open: list[Coord], depth: int) -> list[Coord]:
    dx = 1.7e-9 * (depth + 1)
    dy = 3.1e-9 * (depth + 1)
    return [(x + dx, y + dy) for x, y in ring_open] + [
        (ring_open[0][0] + dx, ring_open[0][1] + dy)
    ]


def _stay_inside(ring: list[tuple[Coord, bool]], idx: int, other_closed: list[Coord]) -> bool:
    pt = ring[idx][0]
    nxt = ring[(idx + 1) % len(ring)][0]
    mid = ((pt[0] + nxt[0]) / 2, (pt[1] + nxt[1]) / 2)
    return _point_in_ring(mid, other_closed) != 0


def _param_along(a: Coord, b: Coord, p: Coord) -> float:
    dx, dy = b[0] - a[0], b[1] - a[1]
    if abs(dx) >= abs(dy):
        return (p[0] - a[0]) / dx if dx else 0.0
    return (p[1] - a[1]) / dy if dy else 0.0


def _augment(
    ring: list[Coord], inters: dict[int, list[tuple[float, Coord]]]
) -> list[tuple[Coord, bool]]:
    out: list[tuple[Coord, bool]] = []
    for i, p in enumerate(ring):
        out.append((p, False))
        for _, q in sorted(inters.get(i, []), key=lambda t: t[0]):
            out.append((q, True))
    return out


def _normalize_open(ring: list[Coord]) -> list[Coord]:
    r = ring[:-1] if ring[0] == ring[-1] else list(ring)
    if _ring_signed_area(r + [r[0]]) < 0:
        r = list(reversed(r))
    return r


def _closed(ring_open: list[Coord]) -> list[Coord]:
    return ring_open + [ring_open[0]]


def intersection_polygons(g1: Geom, g2: Geom) -> list[list[Coord]]:
    """Intersection of the exterior rings of two polygonal geometries
    as closed rings. Holes participate in the predicates but not in the
    clip output (documented subset; the reference's JTS overlay handles
    full hole topology)."""
    out: list[list[Coord]] = []
    for p1 in g1.polygons():
        for p2 in g2.polygons():
            out.extend(_clip_rings(p1[0], p2[0]))
    return out


def intersects_shape_g(g1: Geom, g2: Geom) -> str:
    """'POLYGON EMPTY' when disjoint else intersection WKT
    (GeoUtils.java:284-294) on parsed Geoms — the single kernel behind
    both the string wrapper and the Spark pandas UDF. Non-areal
    intersections (touching points, shared edges) return the JTS-style
    lower-dimension results only as POLYGON EMPTY here
    (proper-crossing clip)."""
    if not intersects(g1, g2):
        return "POLYGON EMPTY"
    rings = intersection_polygons(g1, g2)
    if not rings:
        return "POLYGON EMPTY"
    if len(rings) == 1:
        return to_wkt(Geom("Polygon", [rings[0]]))
    return to_wkt(Geom("MultiPolygon", [[r] for r in rings]))


def geo_intersects_shape(wkt1: str, wkt2: str) -> str | None:
    try:
        return intersects_shape_g(parse_wkt(wkt1), parse_wkt(wkt2))
    except Exception:
        return None


def _tm_project(lng: float, lat: float, lng0: float, lat0: float) -> Coord:
    """Spherical transverse Mercator about (lng0, lat0) — the AUTO:42001
    analog (GeoUtils.java:311-321 builds an auto-UTM CRS at the first
    polygon's centroid; we center the spherical TM there directly).
    k0 = 0.9996 (UTM), R = 6378137 (WGS84 equatorial)."""
    R, k0 = 6378137.0, 0.9996
    lam = math.radians(lng - lng0)
    phi = math.radians(lat)
    B = math.cos(phi) * math.sin(lam)
    B = max(-1 + 1e-15, min(1 - 1e-15, B))
    x = R * k0 * math.atanh(B)
    y = R * k0 * (math.atan2(math.tan(phi), math.cos(lam)) - math.radians(lat0))
    return (x, y)


def intersects_area_g(g1: Geom, g2: Geom) -> float:
    """-1.0 disjoint; 0.0 unless both POLYGON; else intersection area in
    m^2 under a local TM projection (GeoUtils.java:300-327) on parsed
    Geoms — the single kernel behind both the string wrapper and the
    Spark pandas UDF. Only the exterior rings reach the clip, so only
    they are projected."""
    if not intersects(g1, g2):
        return -1.0
    if g1.kind != "Polygon" or g2.kind != "Polygon":
        return 0.0
    lng0, lat0 = g1.centroid()
    p1 = [_tm_project(x, y, lng0, lat0) for x, y in g1.data[0]]
    p2 = [_tm_project(x, y, lng0, lat0) for x, y in g2.data[0]]
    return float(sum(abs(_ring_signed_area(r)) for r in _clip_rings(p1, p2)))


def geo_intersects_area(wkt1: str, wkt2: str) -> float | None:
    try:
        return intersects_area_g(parse_wkt(wkt1), parse_wkt(wkt2))
    except Exception:
        return None


# --------------------------------------------------------------------------
# S2 cell ids (public s2geometry construction)
# --------------------------------------------------------------------------

_MAX_LEVEL = 30
_MAX_SIZE = 1 << _MAX_LEVEL

# Hilbert sub-cell traversal order per orientation, indexed by
# ij = (i_bit << 1) | j_bit -> position along the curve, plus the
# orientation delta each position applies (s2geometry kIJtoPos /
# kPosToOrientation; orientation bit0 = swap, bit1 = invert).
_POS_TO_IJ = (
    (0, 1, 3, 2),  # orientation 0
    (0, 2, 3, 1),  # swap
    (3, 2, 0, 1),  # invert
    (3, 1, 0, 2),  # swap + invert
)
_IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in _POS_TO_IJ
)
_POS_TO_ORIENTATION = (1, 0, 0, 3)


def _latlng_to_xyz(lat: float, lng: float) -> tuple[float, float, float]:
    phi, theta = math.radians(lat), math.radians(lng)
    cp = math.cos(phi)
    return (cp * math.cos(theta), cp * math.sin(theta), math.sin(phi))


def _xyz_to_face_uv(x: float, y: float, z: float) -> tuple[int, float, float]:
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x > 0 else 3
    elif ay >= az:
        face = 1 if y > 0 else 4
    else:
        face = 2 if z > 0 else 5
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z
    return face, u, v


def _face_uv_to_xyz(face: int, u: float, v: float) -> tuple[float, float, float]:
    if face == 0:
        return (1.0, u, v)
    if face == 1:
        return (-u, 1.0, v)
    if face == 2:
        return (-u, -v, 1.0)
    if face == 3:
        return (-1.0, -v, -u)
    if face == 4:
        return (v, -1.0, -u)
    return (v, u, -1.0)


def _uv_to_st(u: float) -> float:
    # quadratic projection (S2_QUADRATIC_PROJECTION)
    if u >= 0:
        return 0.5 * math.sqrt(1 + 3 * u)
    return 1 - 0.5 * math.sqrt(1 - 3 * u)


def _st_to_uv(s: float) -> float:
    if s >= 0.5:
        return (4 * s * s - 1) / 3
    return (1 - 4 * (1 - s) * (1 - s)) / 3


def cellid_from_latlng(lat: float, lng: float, level: int = _MAX_LEVEL) -> int:
    face, u, v = _xyz_to_face_uv(*_latlng_to_xyz(lat, lng))
    i = min(_MAX_SIZE - 1, max(0, int(math.floor(_uv_to_st(u) * _MAX_SIZE))))
    j = min(_MAX_SIZE - 1, max(0, int(math.floor(_uv_to_st(v) * _MAX_SIZE))))
    return cellid_from_face_ij(face, i, j, level)


def cellid_from_face_ij(face: int, i: int, j: int, level: int = _MAX_LEVEL) -> int:
    orientation = face & 1  # bits = face & kSwapMask
    pos = 0
    for k in range(_MAX_LEVEL - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orientation][ij]
        pos = (pos << 2) | p
        orientation ^= _POS_TO_ORIENTATION[p]
    cid = (face << 61) | (pos << 1) | 1  # leaf
    return cellid_parent(cid, level)


def cellid_level(cid: int) -> int:
    lsb = cid & (-cid)
    return _MAX_LEVEL - (lsb.bit_length() - 1) // 2


def cellid_parent(cid: int, level: int) -> int:
    new_lsb = 1 << (2 * (_MAX_LEVEL - level))
    return (cid & ~(2 * new_lsb - 1)) | new_lsb


def cellid_to_token(cid: int) -> str:
    tok = f"{cid:016x}".rstrip("0")
    return tok if tok else "X"  # S2 uses "X" for the zero token


def token_to_cellid(tok: str) -> int:
    if tok == "X":
        return 0
    return int(tok.ljust(16, "0"), 16)


def _cellid_center_ij(cid: int) -> tuple[int, int, int, int]:
    """(face, i, j, size) of the cell's ij square at leaf resolution."""
    face = cid >> 61
    level = cellid_level(cid)
    size = 1 << (_MAX_LEVEL - level)
    pos = (cid & ((1 << 61) - 1)) >> 1
    i = j = 0
    orientation = face & 1
    for k in range(_MAX_LEVEL - 1, _MAX_LEVEL - 1 - level, -1):
        p = (pos >> (2 * k)) & 3
        ij = _POS_TO_IJ[orientation][p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orientation ^= _POS_TO_ORIENTATION[p]
    i <<= _MAX_LEVEL - level
    j <<= _MAX_LEVEL - level
    return face, i, j, size


def cellid_to_latlng(cid: int) -> tuple[float, float]:
    """Center (lat, lng) of the cell."""
    face, i, j, size = _cellid_center_ij(cid)
    s = (i + size / 2) / _MAX_SIZE
    t = (j + size / 2) / _MAX_SIZE
    x, y, z = _face_uv_to_xyz(face, _st_to_uv(s), _st_to_uv(t))
    n = math.sqrt(x * x + y * y + z * z)
    return (math.degrees(math.asin(z / n)), math.degrees(math.atan2(y, x)))


def meter_to_degree(latitude: float, meter: float) -> float:
    """GeoUtils.meterToDegree (GeoUtils.java:120-125)."""
    perimeter = EARTH_CIRCUMFERENCE * math.cos(math.radians(abs(latitude)))
    return (meter / perimeter) * 360.0


def _geom_degree_distance(p: Coord, g: Geom) -> float:
    """Planar degree-space distance from point p to geometry g
    (0 if inside a polygon) — membership test for the buffered region
    without materializing the buffer ring."""
    if _point_in_geom(p, g):
        return 0.0
    best = math.inf
    segs = g.segments()
    if segs:
        for a, b in segs:
            q = _seg_closest_point(p, a, b)
            best = min(best, math.hypot(p[0] - q[0], p[1] - q[1]))
    else:
        for q in g.points():
            best = min(best, math.hypot(p[0] - q[0], p[1] - q[1]))
    return best


def s2_covering_tokens(
    wkt: str, buffer_meters: float = 0.0, level: int = S2_BEST_LEVEL
) -> list[str]:
    """geo_buffer_and_convert_2_s2CellId kernel: buffer the geometry by
    ``buffer_meters`` (planar degree buffer about the centroid latitude,
    GeoUtils.buffer) and return the level-14 cell tokens covering it.

    Covering method: grid-sample the buffered bounding box at half the
    cell's angular pitch and keep cells whose sample point lies within
    the buffered region (planar degree distance <= buffer). This is the
    sampling analog of S2RegionCoverer at min=max=level (it can miss
    cells a sliver touches and includes every cell whose center region
    overlaps; the reference links locations through these tokens, and
    both sides of the link use the same function, so internal
    consistency is what carries semantics). Result capped at
    S2_MAX_CELL_IDS and ordered by cell id, matching the coverer's
    sorted output."""
    g = parse_wkt(wkt)
    if _is_empty(g):
        return []
    cy = g.centroid()[1]
    buf_deg = meter_to_degree(cy, buffer_meters) if buffer_meters > 0 else 0.0
    if g.kind == "Point" and buf_deg == 0.0:
        # S2Cell(fromLatLng) covered at min=max=14 is just the ancestor
        x, y = g.data
        return [cellid_to_token(cellid_from_latlng(y, x, level))]
    x0, y0, x1, y1 = g.bbox()
    x0 -= buf_deg
    y0 -= buf_deg
    x1 += buf_deg
    y1 += buf_deg
    # angular pitch of a level cell near the equator: the face spans 90
    # degrees over 2^level cells; sample at half that, clamped so the
    # sweep stays bounded
    pitch = 90.0 / (1 << level) / 2.0
    span = max(x1 - x0, y1 - y0)
    max_steps = 4096
    if span / pitch > max_steps:
        pitch = span / max_steps
    ids: set[int] = set()
    if buf_deg <= 0 and not g.polygons():
        # zero-area geometry, no buffer: the grid can essentially never
        # hit a measure-zero line/point set — skip straight to the
        # segment walk + vertex cells below
        ny = nx = 0
    else:
        ny = max(2, int(math.ceil((y1 - y0) / pitch)) + 1)
        nx = max(2, int(math.ceil((x1 - x0) / pitch)) + 1)
    for iy in range(ny):
        lat = y0 + iy * pitch
        if lat > 90 or lat < -90:
            continue
        for ix in range(nx):
            lng = x0 + ix * pitch
            if _geom_degree_distance((lng, lat), g) <= buf_deg + 1e-15:
                ids.add(cellid_from_latlng(lat, lng, level))
                if len(ids) >= S2_MAX_CELL_IDS:
                    return [cellid_to_token(c) for c in sorted(ids)]
    # walk the boundary/segments so zero-area geometries (bare
    # LineStrings, thin polygons) emit the cells they pass through —
    # the bbox grid only catches points with distance <= buffer, which
    # a measure-zero line almost never satisfies at grid points
    for a, b in g.segments():
        seg_len = math.hypot(b[0] - a[0], b[1] - a[1])
        steps = max(1, int(math.ceil(seg_len / (pitch / 2))))
        for s_i in range(steps + 1):
            t = s_i / steps
            ids.add(
                cellid_from_latlng(
                    a[1] + t * (b[1] - a[1]), a[0] + t * (b[0] - a[0]), level
                )
            )
            if len(ids) >= S2_MAX_CELL_IDS:
                return [cellid_to_token(c) for c in sorted(ids)]
    # and the cells of the vertices themselves
    for px, py in g.points():
        ids.add(cellid_from_latlng(py, px, level))
    return [cellid_to_token(c) for c in sorted(ids)]
