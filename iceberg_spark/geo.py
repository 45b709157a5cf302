"""Geospatial support: v3 `geometry` / `geography` columns (WKB in binary),
per-file bounding-box statistics, and bbox-intersection predicate pruning.

Spark-first design: geometries are opaque WKB `binary` columns; bbox
extraction is an Arrow-batched pandas UDF; file-level pruning reuses the
manifest min/max slots, storing the bounding box as two WKB points (lower
bound = (xmin, ymin), upper bound = (xmax, ymax)) exactly as the table spec
defines geospatial bounds. Geography X-ranges may wrap the antimeridian
(xmin > xmax means the box spans the 180° line).

Reference parity (behavior, not code):
- api/src/main/java/org/apache/iceberg/types/Types.java:574,640
  (GeometryType / GeographyType)
- api/src/main/java/org/apache/iceberg/geospatial/GeospatialPredicateEvaluators.java
  (bbox intersection; geography wrap-around on X, plain ranges on Y)
- api/src/main/java/org/apache/iceberg/geospatial/BoundingBox.java

Full geometric predicates (exact polygon intersection etc.) belong to a geo
engine (Sedona/shapely); this module implements the spec-level contract:
bbox semantics — exact for point data (the common lat/lon metadata case),
conservative for extended geometries.
"""

from __future__ import annotations

import struct
from typing import NamedTuple, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


class BBox(NamedTuple):
    xmin: float
    ymin: float
    xmax: float
    ymax: float


# ---------------------------------------------------------------------------
# WKB encode / decode
# ---------------------------------------------------------------------------

_POINT = 1
_LINESTRING = 2
_POLYGON = 3
_MULTIPOINT = 4
_MULTILINESTRING = 5
_MULTIPOLYGON = 6
_COLLECTION = 7

# EWKB dimensionality flags (PostGIS); ISO uses type // 1000
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


def wkb_point(x: float, y: float) -> bytes:
    """Little-endian ISO WKB Point."""
    return struct.pack("<BIdd", 1, _POINT, x, y)


def wkb_linestring(pts) -> bytes:
    """Little-endian ISO WKB LineString."""
    out = struct.pack("<BII", 1, _LINESTRING, len(pts))
    for x, y in pts:
        out += struct.pack("<dd", float(x), float(y))
    return out


def wkb_polygon(ring, holes=()) -> bytes:
    """Little-endian ISO WKB Polygon; rings close automatically."""
    def enc(r):
        pts = [(float(x), float(y)) for x, y in r]
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        b = struct.pack("<I", len(pts))
        for x, y in pts:
            b += struct.pack("<dd", x, y)
        return b

    out = struct.pack("<BII", 1, _POLYGON, 1 + len(holes))
    out += enc(ring)
    for h in holes:
        out += enc(h)
    return out


def _geom_dims(raw_type: int) -> tuple[int, int]:
    """(base geometry type, coords per vertex) from an ISO or EWKB type."""
    ndims = 2
    if raw_type & _EWKB_Z:
        ndims += 1
    if raw_type & _EWKB_M:
        ndims += 1
    t = raw_type & 0x0FFFFFFF
    iso = t // 1000  # 0:XY 1:XYZ 2:XYM 3:XYZM
    if iso == 1 or iso == 2:
        ndims = 3
    elif iso == 3:
        ndims = 4
    return t % 1000, ndims


def _coords_bbox(buf: bytes, off: int, n: int, ndims: int, endian: str):
    """bbox over n vertices of ndims doubles starting at off; returns
    (xmin, ymin, xmax, ymax, next_offset)."""
    nb = n * ndims * 8
    arr = np.frombuffer(buf, dtype=(">f8" if endian == ">" else "<f8"),
                        count=n * ndims, offset=off).reshape(n, ndims)
    xs, ys = arr[:, 0], arr[:, 1]
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()), off + nb


def _parse_bbox(buf: bytes, off: int):
    """Parse one WKB geometry at off; returns (bbox-or-None, next_offset).
    None bbox = empty geometry (e.g. zero-vertex collection member)."""
    endian = "<" if buf[off] == 1 else ">"
    (raw_type,) = struct.unpack_from(endian + "I", buf, off + 1)
    off += 5
    if raw_type & _EWKB_SRID:
        off += 4
    base, ndims = _geom_dims(raw_type)
    if base == _POINT:
        x, y = struct.unpack_from(endian + "dd", buf, off)
        off += ndims * 8
        if x != x or y != y:  # NaN point == empty per WKB convention
            return None, off
        return (x, y, x, y), off
    if base == _LINESTRING:
        (n,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        if n == 0:
            return None, off
        x0, y0, x1, y1, off = _coords_bbox(buf, off, n, ndims, endian)
        return (x0, y0, x1, y1), off
    if base == _POLYGON:
        (nrings,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        box = None
        for _ in range(nrings):
            (n,) = struct.unpack_from(endian + "I", buf, off)
            off += 4
            if n == 0:
                continue
            x0, y0, x1, y1, off = _coords_bbox(buf, off, n, ndims, endian)
            box = (x0, y0, x1, y1) if box is None else (
                min(box[0], x0), min(box[1], y0),
                max(box[2], x1), max(box[3], y1))
        return box, off
    if base in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION):
        (n,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        box = None
        for _ in range(n):
            sub, off = _parse_bbox(buf, off)
            if sub is None:
                continue
            box = sub if box is None else (
                min(box[0], sub[0]), min(box[1], sub[1]),
                max(box[2], sub[2]), max(box[3], sub[3]))
        return box, off
    raise ValueError(f"unsupported WKB geometry type {raw_type}")


def wkb_bbox(buf: Optional[bytes]) -> Optional[BBox]:
    """Bounding box of one WKB value (None for NULL/empty)."""
    if buf is None or len(buf) < 5:
        return None
    box, _ = _parse_bbox(bytes(buf), 0)
    return BBox(*box) if box is not None else None


_LE_POINT_HDR = b"\x01\x01\x00\x00\x00"
_PT_DTYPE = np.dtype([("h", "V5"), ("x", "<f8"), ("y", "<f8")])


def batch_bbox(values) -> np.ndarray:
    """(n, 4) float array of [xmin, ymin, xmax, ymax]; NaN rows for
    NULL/empty. Vectorized numpy decode when the whole batch is
    little-endian 2D points (the common lat/lon metadata case); general
    WKB parse otherwise."""
    vals = list(values)
    n = len(vals)
    if n and all(v is not None and len(v) == 21
                 and bytes(v[:5]) == _LE_POINT_HDR for v in vals):
        rec = np.frombuffer(b"".join(bytes(v) for v in vals), dtype=_PT_DTYPE)
        out = np.empty((n, 4))
        out[:, 0] = out[:, 2] = rec["x"]
        out[:, 1] = out[:, 3] = rec["y"]
        return out
    out = np.full((n, 4), np.nan)
    for i, v in enumerate(vals):
        b = wkb_bbox(v)
        if b is not None:
            out[i] = b
    return out


# ---------------------------------------------------------------------------
# bbox intersection (GeospatialPredicateEvaluators semantics)
# ---------------------------------------------------------------------------

def _range_intersects(a_min, a_max, b_min, b_max) -> bool:
    return a_min <= b_max and b_min <= a_max


def _x_intersects_wrap(a_min, a_max, b_min, b_max) -> bool:
    """X-range intersection where either range may wrap the antimeridian
    (min > max means the range spans the 180°/-180° line)."""
    a_wraps, b_wraps = a_min > a_max, b_min > b_max
    if a_wraps and b_wraps:
        return True  # both cross the antimeridian -> both contain x=180
    if a_wraps:
        return b_max >= a_min or b_min <= a_max
    if b_wraps:
        return a_max >= b_min or a_min <= b_max
    return _range_intersects(a_min, a_max, b_min, b_max)


def bbox_intersects(a: BBox, b: BBox, geography: bool = False) -> bool:
    """Whether two bounding boxes intersect. Geometry: plain ranges both
    axes (xmin<=xmax enforced). Geography: Y is a plain range, X wraps."""
    if not geography and (a.xmin > a.xmax or b.xmin > b.xmax):
        raise ValueError("geometry bbox with xmin > xmax")
    if a.ymin > a.ymax or b.ymin > b.ymax:
        raise ValueError("bbox with ymin > ymax")
    if not _range_intersects(a.ymin, a.ymax, b.ymin, b.ymax):
        return False
    if geography:
        return _x_intersects_wrap(a.xmin, a.xmax, b.xmin, b.xmax)
    return _range_intersects(a.xmin, a.xmax, b.xmin, b.xmax)


def stats_bbox(lower: Optional[bytes], upper: Optional[bytes]) -> Optional[BBox]:
    """File bbox from manifest lower/upper bounds (two WKB points)."""
    lo, hi = wkb_bbox(lower), wkb_bbox(upper)
    if lo is None or hi is None:
        return None
    return BBox(lo.xmin, lo.ymin, hi.xmax, hi.ymax)


# ---------------------------------------------------------------------------
# Spark column functions (Arrow-batched; no row-at-a-time Python)
# ---------------------------------------------------------------------------

def st_point(x: Column, y: Column) -> Column:
    """Build WKB points from two double columns."""

    @pandas_udf(T.BinaryType())
    def _mk(xs: pd.Series, ys: pd.Series) -> pd.Series:
        xa = xs.to_numpy(dtype=float)
        ya = ys.to_numpy(dtype=float)
        rec = np.empty(len(xa), dtype=_PT_DTYPE)
        rec["h"] = np.frombuffer(_LE_POINT_HDR, dtype="V5")[0]
        rec["x"], rec["y"] = xa, ya
        buf = rec.tobytes()
        null = np.isnan(xa) | np.isnan(ya)
        return pd.Series(
            [None if null[i] else buf[i * 21:(i + 1) * 21]
             for i in range(len(xa))], dtype=object)

    return _mk(x, y)


_SQ_HDR = struct.pack("<BIII", 1, _POLYGON, 1, 5)
_SQ_DTYPE = np.dtype([("h", "V13"),
                      ("x0", "<f8"), ("y0", "<f8"),
                      ("x1", "<f8"), ("y1", "<f8"),
                      ("x2", "<f8"), ("y2", "<f8"),
                      ("x3", "<f8"), ("y3", "<f8"),
                      ("x4", "<f8"), ("y4", "<f8")])
_SQ_LEN = _SQ_DTYPE.itemsize  # 13 + 80 = 93


def st_square(x: Column, y: Column, half: float) -> Column:
    """Build axis-aligned square WKB POLYGONS centered on two double
    columns — the vectorized polygon-fixture twin of st_point."""

    @pandas_udf(T.BinaryType())
    def _mk(xs: pd.Series, ys: pd.Series) -> pd.Series:
        xa = xs.to_numpy(dtype=float)
        ya = ys.to_numpy(dtype=float)
        rec = np.empty(len(xa), dtype=_SQ_DTYPE)
        rec["h"] = np.frombuffer(_SQ_HDR, dtype="V13")[0]
        h = float(half)
        rec["x0"] = rec["x1"] = rec["x4"] = xa - h
        rec["x2"] = rec["x3"] = xa + h
        rec["y0"] = rec["y3"] = rec["y4"] = ya - h
        rec["y1"] = rec["y2"] = ya + h
        buf = rec.tobytes()
        null = np.isnan(xa) | np.isnan(ya)
        return pd.Series(
            [None if null[i] else buf[i * _SQ_LEN:(i + 1) * _SQ_LEN]
             for i in range(len(xa))], dtype=object)

    return _mk(x, y)


def st_bbox(geom: Column) -> Column:
    """bbox struct (xmin, ymin, xmax, ymax) of a WKB column."""
    schema = T.StructType([
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ])

    @pandas_udf(schema)
    def _bb(gs: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(batch_bbox(gs),
                            columns=["xmin", "ymin", "xmax", "ymax"])

    return _bb(geom)


def st_intersects_bbox(geom: Column, box: BBox, geography: bool = False) -> Column:
    """Row-level bbox-intersection predicate against a constant box —
    the data-side filter behind the ST_INTERSECTS expression. Exact for
    points; conservative (bbox) for extended geometries."""
    qb = BBox(*box)

    @pandas_udf(T.BooleanType())
    def _hit(gs: pd.Series) -> pd.Series:
        bb = batch_bbox(gs)
        xmin, ymin, xmax, ymax = bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3]
        with np.errstate(invalid="ignore"):
            hit_y = (ymin <= qb.ymax) & (qb.ymin <= ymax)
            if geography:
                wraps = xmin > xmax
                plain = (xmin <= qb.xmax) & (qb.xmin <= xmax)
                if qb.xmin > qb.xmax:  # query box crosses the antimeridian
                    hit_x = wraps | (xmax >= qb.xmin) | (xmin <= qb.xmax)
                else:
                    hit_x = np.where(
                        wraps, (qb.xmax >= xmin) | (qb.xmin <= xmax), plain)
            else:
                hit_x = (xmin <= qb.xmax) & (qb.xmin <= xmax)
        res = hit_x & hit_y
        res[np.isnan(xmin)] = False  # NULL/empty geometries never match
        return pd.Series(res)

    return _hit(geom)


# ---------------------------------------------------------------------------
# exact polygon predicates — pure-WKB ray cast (no Sedona/shapely needed).
# Scope: EXACT point-in-polygon data-level evaluation for POINT columns
# (the common lat/lon metadata case); bbox-exact rectangle-vs-polygon at
# the file-stats level. Non-point geometries refuse the exact path loudly
# (a geometry engine's job) — the bbox predicates above stay available.
# ---------------------------------------------------------------------------

_EPS = 1e-12


class Polygon:
    """A simple (non-self-intersecting, closed) polygon ring in XY."""

    __slots__ = ("ring", "bbox")

    def __init__(self, ring):
        pts = [(float(x), float(y)) for x, y in ring]
        if len(pts) >= 2 and pts[0] == pts[-1]:
            pts = pts[:-1]  # accept closed rings; store open
        if len(pts) < 3:
            raise ValueError("polygon needs >= 3 distinct vertices")
        self.ring = tuple(pts)
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        self.bbox = BBox(min(xs), min(ys), max(xs), max(ys))

    def __repr__(self):
        return f"Polygon({len(self.ring)} pts, bbox={tuple(self.bbox)})"

    def __eq__(self, other):
        return isinstance(other, Polygon) and self.ring == other.ring

    def __hash__(self):
        return hash(self.ring)


def _raycast_parts(xs: np.ndarray, ys: np.ndarray, poly: Polygon):
    """Vectorized even-odd ray cast, returning (strict_inside, on_edge)
    separately — hole semantics need the distinction (a point ON a hole
    ring belongs to the polygon; a point strictly inside the hole does
    not)."""
    inside = np.zeros(len(xs), bool)
    on_edge = np.zeros(len(xs), bool)
    ring = poly.ring
    n = len(ring)
    with np.errstate(invalid="ignore", divide="ignore"):
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            cross = (x2 - x1) * (ys - y1) - (y2 - y1) * (xs - x1)
            seg = ((np.minimum(x1, x2) - _EPS <= xs)
                   & (xs <= np.maximum(x1, x2) + _EPS)
                   & (np.minimum(y1, y2) - _EPS <= ys)
                   & (ys <= np.maximum(y1, y2) + _EPS))
            on_edge |= (np.abs(cross) <= _EPS) & seg
            if y1 == y2:
                continue  # horizontal edges only matter for on_edge
            crosses = (y1 > ys) != (y2 > ys)
            xint = (x2 - x1) * (ys - y1) / (y2 - y1) + x1
            inside ^= crosses & (xs < xint)
    return inside & ~on_edge, on_edge


def _raycast(xs: np.ndarray, ys: np.ndarray, poly: Polygon) -> np.ndarray:
    """Points ON an edge count as inside (ST_INTERSECTS semantics:
    boundary touches intersect)."""
    inside, on_edge = _raycast_parts(xs, ys, poly)
    return inside | on_edge


def point_in_polygon(x: float, y: float, poly: Polygon) -> bool:
    return bool(_raycast(np.array([x]), np.array([y]), poly)[0])


def _segments_intersect(p1, p2, p3, p4) -> bool:
    """Proper or touching segment intersection via orientation tests."""
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if abs(v) <= _EPS else (1 if v > 0 else -1)

    def on_seg(a, b, c):  # c collinear with ab: is it between?
        return (min(a[0], b[0]) - _EPS <= c[0] <= max(a[0], b[0]) + _EPS
                and min(a[1], b[1]) - _EPS <= c[1] <= max(a[1], b[1]) + _EPS)

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    if o1 != o2 and o3 != o4:
        return True
    return ((o1 == 0 and on_seg(p1, p2, p3))
            or (o2 == 0 and on_seg(p1, p2, p4))
            or (o3 == 0 and on_seg(p3, p4, p1))
            or (o4 == 0 and on_seg(p3, p4, p2)))


def bbox_intersects_polygon(b: BBox, poly: Polygon) -> bool:
    """EXACT rectangle-vs-polygon intersection (file-stats pruning for
    polygon predicates — tighter than bbox-vs-bbox): overlap gate, then
    vertex containment both ways, then edge-pair intersection."""
    pb = poly.bbox
    if b.xmin > pb.xmax or pb.xmin > b.xmax \
            or b.ymin > pb.ymax or pb.ymin > b.ymax:
        return False
    if any(b.xmin - _EPS <= x <= b.xmax + _EPS
           and b.ymin - _EPS <= y <= b.ymax + _EPS for x, y in poly.ring):
        return True
    corners = [(b.xmin, b.ymin), (b.xmin, b.ymax),
               (b.xmax, b.ymax), (b.xmax, b.ymin)]
    cx = np.array([c[0] for c in corners])
    cy = np.array([c[1] for c in corners])
    if _raycast(cx, cy, poly).any():
        return True
    ring = poly.ring
    n = len(ring)
    for i in range(4):
        r1, r2 = corners[i], corners[(i + 1) % 4]
        for j in range(n):
            if _segments_intersect(r1, r2, ring[j], ring[(j + 1) % n]):
                return True
    return False


def _points_xy(vals) -> tuple:
    """WKB values -> (xs, ys) float arrays; NULL -> NaN. Raises loudly on
    any non-POINT geometry (callers wanting the general path use
    geometry_intersects_polygon)."""
    xs = np.full(len(vals), np.nan)
    ys = np.full(len(vals), np.nan)
    for i, v in enumerate(vals):
        if v is None:
            continue
        buf = bytes(v)
        endian = "<" if buf[0] == 1 else ">"
        (raw_type,) = struct.unpack_from(endian + "I", buf, 1)
        off = 5
        if raw_type & _EWKB_SRID:
            off += 4
        base, _nd = _geom_dims(raw_type)
        if base != _POINT:
            raise NotImplementedError(
                "exact polygon predicates support POINT geometries only "
                f"(got WKB type {base}); use st_intersects (bbox) for "
                "extended geometries")
        x, y = struct.unpack_from(endian + "dd", buf, off)
        xs[i], ys[i] = x, y
    return xs, ys


def _read_ring(buf: bytes, off: int, ndims: int, endian: str):
    """One linear ring / linestring coordinate run -> ([(x, y), ...],
    next_offset)."""
    (n,) = struct.unpack_from(endian + "I", buf, off)
    off += 4
    arr = np.frombuffer(buf, dtype=(">f8" if endian == ">" else "<f8"),
                        count=n * ndims, offset=off).reshape(n, ndims)
    return [(float(r[0]), float(r[1])) for r in arr], off + n * ndims * 8


def _parse_parts(buf: bytes, off: int = 0) -> tuple:
    """One WKB geometry at off -> (parts, next_offset). Parts are
    ('point', x, y) | ('line', [pts]) | ('poly', shell Polygon,
    [hole Polygons]); multi/collection types flatten recursively, empty
    members drop."""
    endian = "<" if buf[off] == 1 else ">"
    (raw_type,) = struct.unpack_from(endian + "I", buf, off + 1)
    off += 5
    if raw_type & _EWKB_SRID:
        off += 4
    base, ndims = _geom_dims(raw_type)
    if base == _POINT:
        x, y = struct.unpack_from(endian + "dd", buf, off)
        off += ndims * 8
        if x != x or y != y:  # NaN = empty point
            return [], off
        return [("point", x, y)], off
    if base == _LINESTRING:
        pts, off = _read_ring(buf, off, ndims, endian)
        return ([("line", pts)] if pts else []), off
    if base == _POLYGON:
        (nrings,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        shell, holes = None, []
        for r in range(nrings):
            pts, off = _read_ring(buf, off, ndims, endian)
            if len(pts) < 3:
                # ring 0 IS the shell by WKB position: a degenerate
                # shell makes the whole polygon empty — a later hole
                # ring must never be promoted to shell (that would
                # invert the hole's interior into polygon interior)
                if r == 0:
                    shell = False
                continue
            if shell is None:
                shell = Polygon(pts)
            elif shell is not False:
                holes.append(Polygon(pts))
        return ([("poly", shell, holes)]
                if isinstance(shell, Polygon) else []), off
    if base in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION):
        (n,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        parts = []
        for _ in range(n):
            sub, off = _parse_parts(buf, off)
            parts.extend(sub)
        return parts, off
    raise ValueError(f"unsupported WKB geometry type {raw_type}")


def _pt_in_poly_holes(x: float, y: float, shell: Polygon, holes) -> bool:
    """Point membership in a polygon WITH holes: in/on the shell, and not
    STRICTLY inside any hole (a point ON a hole ring belongs to the
    polygon boundary)."""
    xs, ys = np.array([x]), np.array([y])
    s_in, s_edge = _raycast_parts(xs, ys, shell)
    if not (s_in[0] or s_edge[0]):
        return False
    for h in holes:
        h_in, _h_edge = _raycast_parts(xs, ys, h)
        if h_in[0]:
            return False
    return True


def _edges(ring) -> list:
    n = len(ring)
    return [(ring[i], ring[(i + 1) % n]) for i in range(n)]


def _any_edge_hit(edges_a, edges_b) -> bool:
    for a1, a2 in edges_a:
        for b1, b2 in edges_b:
            if _segments_intersect(a1, a2, b1, b2):
                return True
    return False


def geometry_intersects_polygon(buf, qpoly: Polygon) -> bool:
    """EXACT ST_INTERSECTS of ONE WKB geometry (any type: point, line,
    polygon-with-holes, multi*, collection) against a constant simple
    polygon. Classic orientation-test geometry, planar XY — geography
    (great-circle edges) stays bind-time refused.

    Per part: points ray-cast; linestrings hit when a vertex lies in the
    query polygon or any segment pair crosses; polygons hit when any ring
    edge crosses a query edge, or one strictly contains the other —
    checked via a query vertex inside the polygon (hole-aware) and a
    shell vertex inside the query. A query polygon wholly inside a HOLE
    touches neither interior nor boundary: no edge crossing, its
    vertices fall outside the hole-aware membership, and the shell's
    vertices fall outside it — correctly disjoint."""
    if buf is None:
        return False
    parts, _ = _parse_parts(bytes(buf))
    q_edges = _edges(qpoly.ring)
    for part in parts:
        if part[0] == "point":
            if point_in_polygon(part[1], part[2], qpoly):
                return True
        elif part[0] == "line":
            pts = part[1]
            xs = np.array([p[0] for p in pts])
            ys = np.array([p[1] for p in pts])
            if _raycast(xs, ys, qpoly).any():
                return True
            segs = [(pts[i], pts[i + 1]) for i in range(len(pts) - 1)]
            if _any_edge_hit(segs, q_edges):
                return True
        else:
            _tag, shell, holes = part
            ring_edges = _edges(shell.ring)
            for h in holes:
                ring_edges.extend(_edges(h.ring))
            if _any_edge_hit(ring_edges, q_edges):
                return True
            if any(_pt_in_poly_holes(x, y, shell, holes)
                   for x, y in qpoly.ring):
                return True
            sx = np.array([p[0] for p in shell.ring])
            sy = np.array([p[1] for p in shell.ring])
            if _raycast(sx, sy, qpoly).any():
                return True
    return False


# ---------------------------------------------------------------------------
# geography: EXACT great-circle evaluation on the unit sphere
# ---------------------------------------------------------------------------
# The reference's own evaluators are bbox-only for geography
# (api/.../geospatial/GeospatialPredicateEvaluators.java) — this layer is
# parity-plus. Geometry on S²: vertices become unit vectors, edges are
# minor great-circle arcs, and every primitive reduces to triple-product
# sign tests (the published S2 edge-crossing formulation). Membership is
# crossing parity against a witness point known to be OUTSIDE the
# polygon: the antipode of the normalized vertex mean — valid for
# polygons smaller than a hemisphere, which this implementation requires
# (the constructor refuses degenerate vertex means loudly). Boundary
# cases (a test point within fp epsilon OF an edge/vertex) are undefined,
# as in any double-precision geometry kernel.


def _sph_xyz(lon, lat):
    """Degrees -> unit vector(s); broadcasts over numpy arrays."""
    lo, la = np.radians(lon), np.radians(lat)
    cl = np.cos(la)
    return np.stack([cl * np.cos(lo), cl * np.sin(lo), np.sin(la)],
                    axis=-1)


class SphPolygon:
    """A spherical polygon (shell ring + holes) in unit-vector form,
    with a precomputed outside witness. Rings are (lon, lat) degree
    pairs; closed duplicates are dropped."""

    def __init__(self, ring, holes=()):
        self.shell = self._ring_xyz(ring)
        self.holes = [self._ring_xyz(h) for h in holes]
        m = self.shell.mean(axis=0)
        nm = float(np.linalg.norm(m))
        if nm < 1e-9:
            raise NotImplementedError(
                "geography polygon spans a near-hemisphere (vertex mean "
                "~0): witness-point membership is ambiguous — split the "
                "query polygon")
        w = -m / nm
        # nudge the witness off any symmetry axis of the polygon: an
        # exactly-antipodal witness makes test points that share the
        # polygon's meridian of symmetry shoot their parity arc straight
        # through a vertex (degenerate crossing). The ~0.1° fixed
        # irrational-direction offset keeps it outside any polygon whose
        # boundary stays >0.1° from its vertex-mean antipode.
        w = w + np.array([1.23e-3, 2.71e-3, 1.77e-3])
        self.witness = w / float(np.linalg.norm(w))

    @staticmethod
    def _ring_xyz(ring):
        pts = [(float(x), float(y)) for x, y in ring]
        if len(pts) > 1 and pts[0] == pts[-1]:
            pts = pts[:-1]
        if len(pts) < 3:
            raise ValueError("spherical ring needs >= 3 distinct vertices")
        return _sph_xyz(np.array([p[0] for p in pts]),
                        np.array([p[1] for p in pts]))


def _sph_crossing(a, b, c, d) -> bool:
    """Do minor arcs ab and cd cross (S2 SimpleCrossing)? Shared or
    antipodal endpoints return False — exactness there is fp-undefined."""
    ab = np.cross(a, b)
    acb = -float(np.dot(ab, c))
    bda = float(np.dot(ab, d))
    if acb * bda <= 0:
        return False
    cd = np.cross(c, d)
    cbd = -float(np.dot(cd, b))
    dac = float(np.dot(cd, a))
    return acb * cbd > 0 and acb * dac > 0


def _sph_ring_edges(ring_xyz):
    n = len(ring_xyz)
    return [(ring_xyz[i], ring_xyz[(i + 1) % n]) for i in range(n)]


def _sph_in_ring(p, ring_xyz, witness) -> bool:
    """Crossing parity of the arc p->witness against the ring edges."""
    k = 0
    for a, b in _sph_ring_edges(ring_xyz):
        if _sph_crossing(p, witness, a, b):
            k += 1
    return k % 2 == 1


def sph_point_in_polygon(p, spoly: SphPolygon) -> bool:
    if not _sph_in_ring(p, spoly.shell, spoly.witness):
        return False
    return not any(_sph_in_ring(p, h, spoly.witness)
                   for h in spoly.holes)


def _sph_points_in_polygon(xs: np.ndarray, ys: np.ndarray,
                           spoly: SphPolygon) -> np.ndarray:
    """Vectorized point-batch membership: per ring edge, the S2
    crossing test evaluates over the whole point array at once."""
    P = _sph_xyz(xs, ys)  # (n, 3); NaN rows stay False
    w = spoly.witness

    def ring_parity(ring_xyz):
        k = np.zeros(len(P), dtype=np.int64)
        PW = np.cross(P, w)  # (n, 3)
        for a, b in _sph_ring_edges(ring_xyz):
            acb = -(PW @ a)
            bda = PW @ b
            c1 = acb * bda > 0
            ab_n = np.cross(a, b)
            cbd = -float(np.dot(ab_n, w))
            dac = P @ ab_n
            hit = c1 & (acb * cbd > 0) & (acb * dac > 0)
            k += hit.astype(np.int64)
        return k % 2 == 1

    inside = ring_parity(spoly.shell)
    for h in spoly.holes:
        inside &= ~ring_parity(h)
    inside[np.isnan(xs)] = False
    return inside


def _sph_any_edge_hit(edges_a, edges_b) -> bool:
    for a1, a2 in edges_a:
        for b1, b2 in edges_b:
            if _sph_crossing(a1, a2, b1, b2):
                return True
    return False


def _sph_pt_in_poly_holes(p, shell_xyz, holes_xyz, witness) -> bool:
    if not _sph_in_ring(p, shell_xyz, witness):
        return False
    return not any(_sph_in_ring(p, h, witness) for h in holes_xyz)


def geography_intersects_polygon(buf, spoly: SphPolygon) -> bool:
    """EXACT great-circle ST_INTERSECTS of ONE WKB geography (any kind)
    against a constant spherical polygon — the geography twin of
    geometry_intersects_polygon, with arcs instead of segments. Data
    polygons get their own witness (antipode of their vertex mean), so
    the same smaller-than-hemisphere contract applies to them."""
    if buf is None:
        return False
    parts, _ = _parse_parts(bytes(buf))
    q_edges = _sph_ring_edges(spoly.shell)
    for h in spoly.holes:
        q_edges = q_edges + _sph_ring_edges(h)
    for part in parts:
        if part[0] == "point":
            if sph_point_in_polygon(_sph_xyz(part[1], part[2]), spoly):
                return True
        elif part[0] == "line":
            pts = part[1]
            V = _sph_xyz(np.array([p[0] for p in pts]),
                         np.array([p[1] for p in pts]))
            if any(sph_point_in_polygon(v, spoly) for v in V):
                return True
            segs = [(V[i], V[i + 1]) for i in range(len(V) - 1)]
            if _sph_any_edge_hit(segs, q_edges):
                return True
        else:
            _tag, shell, holes = part
            d = SphPolygon(shell.ring, [h.ring for h in holes])
            ring_edges = _sph_ring_edges(d.shell)
            for h in d.holes:
                ring_edges.extend(_sph_ring_edges(h))
            if _sph_any_edge_hit(ring_edges, q_edges):
                return True
            # containment either way, hole-aware on both sides
            if any(_sph_pt_in_poly_holes(v, d.shell, d.holes, d.witness)
                   for v in spoly.shell):
                return True
            if any(sph_point_in_polygon(v, spoly) for v in d.shell):
                return True
    return False


def _sph_edge_lat_range(a, b):
    """Exact latitude extremes of the minor arc a->b: the endpoints,
    plus the great circle's apex/nadir when they fall ON the arc (the
    geodesic bulge planar math misses)."""
    zs = [float(a[2]), float(b[2])]
    n = np.cross(a, b)
    nn = float(np.linalg.norm(n))
    if nn > 1e-15:
        n = n / nn
        # apex = unit projection of +z onto the circle's plane
        v = np.array([0.0, 0.0, 1.0]) - n[2] * n
        vn = float(np.linalg.norm(v))
        if vn > 1e-15:
            for apex in (v / vn, -(v / vn)):
                # on minor arc iff it lies rotationally between a and b
                if (float(np.dot(np.cross(a, apex), n)) >= 0
                        and float(np.dot(np.cross(apex, b), n)) >= 0):
                    zs.append(float(apex[2]))
    zmin, zmax = min(zs), max(zs)
    return (float(np.degrees(np.arcsin(max(-1.0, min(1.0, zmin))))),
            float(np.degrees(np.arcsin(max(-1.0, min(1.0, zmax))))))


def sph_polygon_bbox(spoly: SphPolygon, ring) -> BBox:
    """Conservative lon/lat bbox of a spherical polygon for file-level
    pruning. Longitude: minor arcs never leave the shorter interval
    between endpoint longitudes (each meridian plane cuts a great
    circle's minor arc at most once), accumulated wrap-aware; a 180°
    jump or >=360° total coverage degrades to the full range. Latitude:
    exact per-edge arc extremes (apex-aware). A pole inside the polygon
    extends the touched latitude to ±90 and longitude to full range."""
    pts = [(float(x), float(y)) for x, y in ring]
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    lons = [p[0] for p in pts]
    full = False
    # wrap-aware accumulation: track offsets from the start longitude
    off = 0.0
    offs = [0.0]
    cur = lons[0]
    for nxt in lons[1:]:
        d = (nxt - cur + 180.0) % 360.0 - 180.0
        if abs(abs(d) - 180.0) < 1e-12:
            full = True
            break
        off += d
        offs.append(off)
        cur = nxt
    lat_lo, lat_hi = 90.0, -90.0
    V = spoly.shell
    n = len(V)
    for i in range(n):
        a, b = V[i], V[(i + 1) % n]
        el, eh = _sph_edge_lat_range(a, b)
        lat_lo, lat_hi = min(lat_lo, el), max(lat_hi, eh)
    for pole_z, pole_lat in ((1.0, 90.0), (-1.0, -90.0)):
        pole = np.array([0.0, 0.0, pole_z])
        if _sph_in_ring(pole, spoly.shell, spoly.witness):
            full = True
            lat_lo, lat_hi = min(lat_lo, pole_lat), max(lat_hi, pole_lat)
            if pole_lat > 0:
                lat_hi = 90.0
            else:
                lat_lo = -90.0
    if full or (max(offs) - min(offs)) >= 360.0:
        return BBox(-180.0, lat_lo, 180.0, lat_hi)
    xmin = lons[0] + min(offs)
    xmax = lons[0] + max(offs)
    # normalize to [-180, 180], expressing wrap as xmin > xmax
    norm = lambda v: (v + 180.0) % 360.0 - 180.0  # noqa: E731
    nx0, nx1 = norm(xmin), norm(xmax)
    if xmax - xmin >= 360.0:
        return BBox(-180.0, lat_lo, 180.0, lat_hi)
    return BBox(nx0, lat_lo, nx1, lat_hi)


def st_intersects_polygon(geom: Column, poly: Polygon,
                          geography: bool = False) -> Column:
    """Row-level EXACT intersects predicate against a constant polygon —
    the data-side filter behind ST_INTERSECTS_POLY. POINT batches run
    the vectorized ray cast (planar) or vectorized S2 crossing parity
    (geography); any other geometry kind falls to the per-row WKB
    evaluator (exact for linestrings, polygons with holes,
    multi-geometries, and collections in both modes)."""
    spoly = SphPolygon(poly.ring) if geography else None

    @pandas_udf(T.BooleanType())
    def _hit(gs: pd.Series) -> pd.Series:
        vals = list(gs)
        if all(v is None or (len(v) == 21 and bytes(v[:5]) == _LE_POINT_HDR)
               for v in vals):
            xs, ys = _points_xy(vals)
            if geography:
                return pd.Series(_sph_points_in_polygon(xs, ys, spoly))
            res = _raycast(xs, ys, poly)
            res[np.isnan(xs)] = False  # NULLs never match
            return pd.Series(res)
        if geography:
            return pd.Series([geography_intersects_polygon(v, spoly)
                              for v in vals])
        return pd.Series([geometry_intersects_polygon(v, poly)
                          for v in vals])

    return _hit(geom)


# ---------------------------------------------------------------------------
# write-side stats: per-file bbox as (lower WKB point, upper WKB point)
# ---------------------------------------------------------------------------

def column_bbox_bounds(values) -> tuple[Optional[bytes], Optional[bytes], int]:
    """Aggregate bbox over an iterable of WKB values. Returns (lower_point,
    upper_point, null_count). Plain min/max per axis — a file of points
    near both ±180° gets a world-spanning (conservative, still correct)
    box; wrap-aware bounds can be layered on later without a format
    change, since the evaluator already understands xmin > xmax."""
    vals = list(values)
    bb = batch_bbox(vals)
    # null_count must count actual SQL NULLs only: an empty (zero-vertex)
    # geometry also yields a NaN bbox row but IS NOT NULL — conflating the
    # two breaks IS [NOT] NULL pruning and strict metadata-only deletes
    nulls = sum(1 for v in vals if v is None)
    if np.isnan(bb[:, 0]).all():
        return None, None, nulls
    return (wkb_point(float(np.nanmin(bb[:, 0])), float(np.nanmin(bb[:, 1]))),
            wkb_point(float(np.nanmax(bb[:, 2])), float(np.nanmax(bb[:, 3]))),
            nulls)
