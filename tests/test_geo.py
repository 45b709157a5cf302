"""Geospatial types (v3 geometry/geography): WKB bbox extraction,
bounding-box predicate evaluation with geography antimeridian wrap-around,
per-file bbox stats, and scan-time pruning.

Reference behavior: api/.../types/Types.java:574,640,
api/.../geospatial/GeospatialPredicateEvaluators.java,
api/.../geospatial/BoundingBox.java.
"""

import struct

import pytest
from pyspark.sql import functions as F

from iceberg_spark import expressions as E
from iceberg_spark.geo import (
    BBox,
    bbox_intersects,
    column_bbox_bounds,
    st_bbox,
    st_intersects_bbox,
    st_point,
    stats_bbox,
    wkb_bbox,
    wkb_point,
)
from iceberg_spark.schema import NestedField, Schema


def _wkb(kind: int, *coords, endian="<", ndims=2):
    order = 1 if endian == "<" else 0
    out = struct.pack(endian + "BI", order, kind)
    if kind == 1:  # point
        return out + struct.pack(endian + "d" * ndims, *coords)
    out += struct.pack(endian + "I", len(coords))
    for c in coords:
        out += struct.pack(endian + "d" * ndims, *c)
    return out


# -- WKB parsing ------------------------------------------------------------

def test_wkb_point_roundtrip():
    assert wkb_bbox(wkb_point(10.0, -5.0)) == BBox(10.0, -5.0, 10.0, -5.0)


def test_wkb_linestring_bbox():
    ls = _wkb(2, (0.0, 0.0), (3.0, -2.0), (1.0, 5.0))
    assert wkb_bbox(ls) == BBox(0.0, -2.0, 3.0, 5.0)


def test_wkb_big_endian_point():
    p = _wkb(1, 7.0, 8.0, endian=">")
    assert wkb_bbox(p) == BBox(7.0, 8.0, 7.0, 8.0)


def test_wkb_polygon_and_multi():
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    poly = struct.pack("<BII", 1, 3, 1) + struct.pack("<I", len(ring))
    for c in ring:
        poly += struct.pack("<dd", *c)
    assert wkb_bbox(poly) == BBox(0.0, 0.0, 4.0, 4.0)
    multi = struct.pack("<BII", 1, 4, 2) + wkb_point(1.0, 1.0) + wkb_point(-3.0, 9.0)
    assert wkb_bbox(multi) == BBox(-3.0, 1.0, 1.0, 9.0)


def test_wkb_xyz_point():
    p = struct.pack("<BIddd", 1, 1001, 1.0, 2.0, 3.0)  # ISO XYZ
    assert wkb_bbox(p) == BBox(1.0, 2.0, 1.0, 2.0)


def test_wkb_null_and_empty():
    assert wkb_bbox(None) is None
    nan = float("nan")
    assert wkb_bbox(struct.pack("<BIdd", 1, 1, nan, nan)) is None


# -- bbox intersection (GeospatialPredicateEvaluators parity) ---------------

def test_geometry_intersects_basic():
    a = BBox(0, 0, 10, 10)
    assert bbox_intersects(a, BBox(5, 5, 15, 15))
    assert bbox_intersects(a, BBox(10, 10, 20, 20))  # touching counts
    assert not bbox_intersects(a, BBox(11, 0, 20, 10))
    assert not bbox_intersects(a, BBox(0, 11, 10, 20))


def test_geometry_rejects_wrapped_box():
    with pytest.raises(ValueError):
        bbox_intersects(BBox(170, 0, -170, 10), BBox(0, 0, 1, 1))


def test_geography_wraparound():
    # box spanning 170..180/-180..-170 (xmin > xmax == antimeridian cross)
    wrap = BBox(170.0, -10.0, -170.0, 10.0)
    assert bbox_intersects(wrap, BBox(175.0, -5.0, 179.0, 5.0), geography=True)
    assert bbox_intersects(wrap, BBox(-179.0, -5.0, -175.0, 5.0), geography=True)
    assert not bbox_intersects(wrap, BBox(-160.0, -5.0, 0.0, 5.0), geography=True)
    # two wrapped boxes always share x=180
    assert bbox_intersects(wrap, BBox(179.0, -5.0, -179.0, 5.0), geography=True)
    # y-disjoint still rejects
    assert not bbox_intersects(wrap, BBox(175.0, 20.0, 179.0, 30.0), geography=True)


# -- metrics evaluation -----------------------------------------------------

def _geo_schema(typ="geometry"):
    return Schema((NestedField(1, "id", "long", True),
                   NestedField(2, "geom", typ, False)))


def _fs(lo, hi, nulls=0, n=10):
    return E.FileStats(n, {"geom": (lo, hi, nulls, None, n)})


def test_inclusive_metrics_geo():
    expr = E.bind(E.st_intersects("geom", (5, 5, 15, 15)), _geo_schema())
    fs_hit = _fs(wkb_point(0, 0), wkb_point(10, 10))
    fs_miss = _fs(wkb_point(20, 20), wkb_point(30, 30))
    fs_nostats = _fs(None, None)
    assert E.inclusive_metrics_eval(expr, fs_hit)
    assert not E.inclusive_metrics_eval(expr, fs_miss)
    assert E.inclusive_metrics_eval(expr, fs_nostats)


def test_inclusive_metrics_geography_wrap():
    # file bbox wraps the antimeridian: xmin 170 > xmax -170
    expr = E.bind(E.st_intersects("geom", (-179.0, -5.0, -175.0, 5.0)),
                  _geo_schema("geography"))
    fs_wrap = _fs(wkb_point(170.0, -10.0), wkb_point(-170.0, 10.0))
    assert E.inclusive_metrics_eval(expr, fs_wrap)
    expr2 = E.bind(E.st_intersects("geom", (-160.0, -5.0, 0.0, 5.0)),
                   _geo_schema("geography"))
    assert not E.inclusive_metrics_eval(expr2, fs_wrap)


def test_strict_metrics_geo_containment():
    schema = _geo_schema()
    fs_in = _fs(wkb_point(6, 6), wkb_point(9, 9))
    fs_part = _fs(wkb_point(0, 0), wkb_point(10, 10))
    contained = E.bind(E.st_intersects("geom", (5, 5, 15, 15)), schema)
    assert E.strict_metrics_eval(contained, fs_in)
    assert not E.strict_metrics_eval(contained, fs_part)
    # nulls block strict match
    assert not E.strict_metrics_eval(contained, _fs(wkb_point(6, 6),
                                                    wkb_point(9, 9), nulls=1))
    # strict disjoint: file box fully outside
    disj = E.bind(E.st_disjoint("geom", (100, 100, 110, 110)), schema)
    assert E.strict_metrics_eval(disj, fs_in)
    assert not E.strict_metrics_eval(
        E.bind(E.st_disjoint("geom", (8, 8, 12, 12)), schema), fs_in)


def test_stats_bbox_roundtrip():
    lo, hi, nulls = column_bbox_bounds(
        [wkb_point(1, 2), wkb_point(-5, 7), None])
    assert nulls == 1
    assert stats_bbox(lo, hi) == BBox(-5.0, 2.0, 1.0, 7.0)


# -- Spark column functions -------------------------------------------------

def test_st_point_bbox_columns(spark):
    df = spark.range(4).select(
        F.col("id"),
        st_point(F.col("id").cast("double"),
                 (F.col("id") * 2).cast("double")).alias("geom"))
    out = df.select("id", st_bbox("geom").alias("b")).collect()
    for r in out:
        assert r.b.xmin == float(r.id) and r.b.ymin == float(r.id * 2)
    hits = df.filter(st_intersects_bbox(F.col("geom"), BBox(1, 2, 2, 4))).collect()
    assert sorted(r.id for r in hits) == [1, 2]


# -- end-to-end scan with bbox pruning --------------------------------------

def test_geo_table_scan_prunes_files(catalog, spark):
    schema = Schema((NestedField(1, "id", "long", True),
                     NestedField(2, "geom", "geometry", False)))
    t = catalog.create_table("geo.pts", schema)
    # three appends with disjoint lon bands -> three files, distinct bboxes
    for lo in (-150, -50, 50):
        df = spark.range(lo + 150, lo + 200).select(
            F.col("id"),
            st_point(F.lit(float(lo)) + (F.col("id") % 50).cast("double"),
                     (F.col("id") % 80).cast("double") - 40.0).alias("geom"))
        t.append(df)
    t = catalog.load_table("geo.pts")
    scan = t.scan(filter=E.st_intersects("geom", (-140.0, -90.0, -120.0, 90.0)))
    plan = scan.plan_files()
    # only files whose lon band overlaps [-140, -120] survive bbox pruning
    assert plan.report.skipped_data_files > 0
    assert plan.report.result_data_files <= plan.report.total_data_files // 2
    rows = scan.df().collect()
    assert len(rows) > 0
    for r in rows:
        b = wkb_bbox(r.geom)
        assert -140.0 <= b.xmin <= -120.0


def test_geography_scan_wrap_query(catalog, spark):
    schema = Schema((NestedField(1, "id", "long", True),
                     NestedField(2, "geom", "geography", False)))
    t = catalog.create_table("geo.geog", schema)
    pts = [(1, 175.0, 0.0), (2, -178.0, 0.0), (3, 0.0, 0.0), (4, 150.0, 0.0)]
    df = spark.createDataFrame(pts, ["id", "lon", "lat"]).select(
        "id", st_point("lon", "lat").alias("geom"))
    t.append(df)
    t = catalog.load_table("geo.geog")
    # query box wraps the antimeridian: lon in [170, 180] ∪ [-180, -170]
    scan = t.scan(filter=E.st_intersects("geom", (170.0, -10.0, -170.0, 10.0)))
    rows = scan.df().collect()
    assert sorted(r.id for r in rows) == [1, 2]


# --- exact polygon predicates (pure-WKB ray cast) ---------------------------


def test_polygon_ctor_and_raycast():
    import numpy as np

    from iceberg_spark.geo import Polygon, _raycast, point_in_polygon

    diamond = Polygon([(-40, 0), (0, 40), (40, 0), (0, -40), (-40, 0)])
    assert len(diamond.ring) == 4  # closed ring stored open
    assert tuple(diamond.bbox) == (-40, -40, 40, 40)
    # inside / outside / vertex / edge midpoint (boundary intersects)
    assert point_in_polygon(0, 0, diamond)
    assert not point_in_polygon(41.0, 0.5, diamond)
    assert point_in_polygon(-40, 0, diamond)           # vertex
    assert point_in_polygon(-20, 20, diamond)          # on edge
    assert not point_in_polygon(-39, 39, diamond)      # bbox-in, poly-out
    # concave polygon (L-shape)
    ell = Polygon([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)])
    assert point_in_polygon(1, 3, ell)
    assert not point_in_polygon(3, 3, ell)
    xs = np.array([1.0, 3.0]); ys = np.array([3.0, 3.0])
    assert list(_raycast(xs, ys, ell)) == [True, False]
    with pytest.raises(ValueError):
        Polygon([(0, 0), (1, 1)])


def test_bbox_intersects_polygon_exact():
    from iceberg_spark.geo import BBox, Polygon, bbox_intersects_polygon

    diamond = Polygon([(-40, 0), (0, 40), (40, 0), (0, -40)])
    assert bbox_intersects_polygon(BBox(-5, -5, 5, 5), diamond)   # inside
    assert bbox_intersects_polygon(BBox(-60, -60, 60, 60), diamond)  # around
    # bbox overlaps the polygon's bbox CORNER but misses the diamond
    assert not bbox_intersects_polygon(BBox(30, 30, 39, 39), diamond)
    assert not bbox_intersects_polygon(BBox(100, 0, 110, 5), diamond)
    # edge-crossing rectangle with no vertex containment either way
    assert bbox_intersects_polygon(BBox(-60, -1, 60, 1), diamond)


def test_st_intersects_polygon_dataframe(spark):
    from iceberg_spark.geo import st_intersects_polygon, st_point

    df = (spark.range(0, 100)
          .selectExpr("id",
                      "cast(id % 20 as double) - 10 as x",
                      "cast(cast(id / 20 as int) as double) * 5 - 10 as y")
          .select("id", st_point("x", "y").alias("g"),
                  "x", "y"))
    from iceberg_spark.geo import Polygon

    diamond = Polygon([(-8.5, 0.0), (0.0, 8.5), (8.5, 0.0), (0.0, -8.5)])
    got = sorted(r.id for r in
                 df.filter(st_intersects_polygon(F.col("g"), diamond))
                 .select("id").collect())
    want = sorted(i for i in range(100)
                  if abs((i % 20) - 10) + abs((i // 20) * 5 - 10) <= 8.5)
    assert got == want and got


def test_polygon_scan_prunes_and_matches(catalog, spark):
    from iceberg_spark.geo import st_point

    df = (spark.range(0, 1000)
          .selectExpr("id",
                      "cast(id % 100 as double) * 3.6 - 180 as x",
                      "cast(cast(id / 100 as int) as double) * 18 - 90 as y")
          .repartitionByRange(8, "x").sortWithinPartitions("x")
          .select("id", st_point("x", "y").alias("geom")))
    schema = Schema((NestedField(1, "id", "long", True),
                     NestedField(2, "geom", "geometry", False)))
    t = catalog.create_table("db.geo_poly", schema)
    t.append(df)
    t = catalog.load_table("db.geo_poly")
    ring = [(-60.5, 10.5), (-20.5, 50.5), (19.5, 10.5), (-20.5, -29.5)]
    scan = t.scan(filter=E.st_intersects_polygon("geom", ring))
    total = len(t.scan().plan_files().files)
    kept = len(scan.plan_files().files)
    assert 0 < kept < total
    got = sorted(r.id for r in scan.df().select("id").collect())
    want = sorted(
        i for i in range(1000)
        if abs(((i % 100) * 3.6 - 180) + 20.5)
        + abs((i // 100) * 18 - 90 - 10.5) <= 40)
    assert got == want and got


def test_polygon_predicate_geography_exact(catalog, spark):
    """Geography columns evaluate ST_INTERSECTS_POLY EXACTLY on the
    sphere (r12; previously bind-time refused): the geodesic between
    (-60,40) and (60,40) bulges to ~59.2N at lon 0, so a point at
    (0,45) — inside any planar reading of the triangle — is OUTSIDE
    spherically, and (0,65) is inside."""
    from iceberg_spark.geo import st_point

    rows = [(1, 0.0, 45.0),   # under the geodesic bulge: outside
            (2, 0.0, 65.0),   # between bulge and apex: inside
            (3, 0.0, 75.0),   # above the apex: outside
            (4, -59.0, 41.0)]  # near a vertex, inside
    df = (spark.createDataFrame(rows, ["id", "x", "y"])
          .select("id", st_point("x", "y").alias("geog")))
    schema = Schema((NestedField(1, "id", "long", True),
                     NestedField(2, "geog", "geography", False)))
    t = catalog.create_table("db.geo_poly_g", schema)
    t.append(df)
    t = catalog.load_table("db.geo_poly_g")
    got = sorted(r.id for r in t.scan(filter=E.st_intersects_polygon(
        "geog", [(-60.0, 40.0), (60.0, 40.0), (0.0, 70.0)])).df().collect())
    assert got == [2, 4]
    # planar twin on the same ring keeps (0,45): the difference IS the
    # great-circle semantics
    from iceberg_spark.geo import Polygon, point_in_polygon

    assert point_in_polygon(0.0, 45.0,
                            Polygon([(-60, 40), (60, 40), (0, 70)]))


def test_polygon_predicate_nonpoint_refused(spark):
    from iceberg_spark.geo import Polygon, _points_xy

    # a WKB LINESTRING must refuse the exact path loudly
    import struct as _st

    ls = _st.pack("<BII", 1, 2, 2) + _st.pack("<dddd", 0, 0, 1, 1)
    with pytest.raises(NotImplementedError, match="POINT"):
        _points_xy([ls])


def test_st_disjoint_polygon(spark):
    from iceberg_spark.geo import Polygon, st_point

    df = (spark.range(0, 20)
          .selectExpr("id", "cast(id as double) as x",
                      "cast(0.5 as double) as y")
          .select("id", st_point("x", "y").alias("g")))
    ring = [(4.5, -1.0), (9.5, -1.0), (9.5, 2.0), (4.5, 2.0)]
    got = sorted(r.id for r in
                 df.filter(E.to_spark(E.bind(
                     E.st_disjoint_polygon("g", ring),
                     Schema((NestedField(1, "id", "long", True),
                             NestedField(2, "g", "geometry", False))))))
                 .select("id").collect())
    assert got == [i for i in range(20) if not (4.5 <= i <= 9.5)]


def test_geometry_intersects_polygon_all_kinds():
    """Exact non-POINT intersects (geometry_intersects_polygon): lines,
    polygons with holes, multis, collections — against a unit-square
    query polygon scaled to [0,10]^2."""
    from iceberg_spark.geo import (Polygon, geometry_intersects_polygon,
                                   wkb_linestring, wkb_point, wkb_polygon)

    q = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
    hit = lambda b: geometry_intersects_polygon(b, q)
    assert hit(wkb_polygon([(5, 5), (15, 5), (15, 15), (5, 15)]))
    assert not hit(wkb_polygon([(20, 20), (30, 20), (30, 30), (20, 30)]))
    assert hit(wkb_polygon([(-5, -5), (15, -5), (15, 15), (-5, 15)]))
    assert hit(wkb_polygon([(4, 4), (6, 4), (6, 6), (4, 6)]))
    # query wholly inside a HOLE: boundary untouched -> disjoint
    donut_around = wkb_polygon(
        [(-20, -20), (30, -20), (30, 30), (-20, 30)],
        holes=[[(-5, -5), (15, -5), (15, 15), (-5, 15)]])
    assert not hit(donut_around)
    # hole inside the query: the hole RING is polygon boundary -> hits
    assert hit(wkb_polygon(
        [(-20, -20), (30, -20), (30, 30), (-20, 30)],
        holes=[[(5, 5), (8, 5), (8, 8), (5, 8)]]))
    assert hit(wkb_polygon([(10, 0), (20, 0), (20, 10), (10, 10)]))  # touch
    assert hit(wkb_linestring([(-5, 5), (15, 5)]))  # crosses through
    assert not hit(wkb_linestring([(20, 20), (30, 30)]))
    assert hit(wkb_point(5, 5)) and not hit(wkb_point(50, 5))
    assert not hit(None)
    # multipolygon: one member in, one out
    mp = (struct.pack("<BII", 1, 6, 2)
          + wkb_polygon([(20, 20), (30, 20), (30, 30), (20, 30)])
          + wkb_polygon([(4, 4), (6, 4), (6, 6), (4, 6)]))
    assert geometry_intersects_polygon(mp, q)
    # collection of two misses
    gc = (struct.pack("<BII", 1, 7, 2)
          + wkb_point(50, 50)
          + wkb_linestring([(20, 20), (30, 30)]))
    assert not geometry_intersects_polygon(gc, q)


def test_polygon_column_scan_exact(catalog, spark):
    """Table-level: a polygon-column scan with ST_INTERSECTS_POLY returns
    exactly the squares whose L1 distance to the diamond center clears
    the radius — squares near the diamond's bbox corner must NOT match
    (that is the exact-vs-bbox difference)."""
    from iceberg_spark.geo import st_square

    df = (spark.range(0, 41)
          .selectExpr("id", "cast(id * 5 - 100 as double) as x",
                      "cast(0.0 as double) as y")
          .select("id", st_square("x", "y", 2.0).alias("g")))
    schema = Schema((NestedField(1, "id", "long", True),
                     NestedField(2, "g", "geometry", False)))
    t = catalog.create_table("db.geo_sq", schema)
    t.append(df)
    t = t.refresh()
    # diamond |x|+|y| <= 30 centered at origin
    ring = [(-30.0, 0.0), (0.0, 30.0), (30.0, 0.0), (0.0, -30.0)]
    got = sorted(r.id for r in t.scan(
        filter=E.st_intersects_polygon("g", ring)).df().collect())
    want = [i for i in range(41)
            if max(0.0, abs(i * 5 - 100) - 2.0) + 0.0 <= 30.0]
    assert got == want
    # a corner square: center (34,27) is inside the diamond's BBOX
    # ([-30,30]^2 overlaps [32,36]x[25,29]? no — pick (25,25)): the
    # square at (25,25) half 2 intersects the bbox but L1 dist is
    # 23+23=46 > 30 -> exact path must exclude it
    from iceberg_spark.geo import (Polygon, geometry_intersects_polygon,
                                   wkb_polygon)

    corner = wkb_polygon([(23, 23), (27, 23), (27, 27), (23, 27)])
    assert not geometry_intersects_polygon(corner, Polygon(ring))


def test_geometry_intersects_polygon_properties():
    """Property checks (hypothesis): no false NEGATIVES — whenever a
    sampled grid point lies in both the geometry and the query polygon,
    the exact predicate must say intersects; and bbox-disjoint pairs
    must never intersect (soundness of the True side)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iceberg_spark.geo import (Polygon, _raycast,
                                   geometry_intersects_polygon,
                                   wkb_polygon)

    coords = st.integers(min_value=-40, max_value=40)

    @settings(max_examples=120, deadline=None)
    @given(coords, coords, st.integers(1, 12), coords, coords,
           st.integers(1, 12))
    def prop(ax, ay, ah, qx, qy, qh):
        geom = wkb_polygon([(ax - ah, ay - ah), (ax + ah, ay - ah),
                            (ax + ah, ay + ah), (ax - ah, ay + ah)])
        # query: diamond centered (qx,qy) radius qh
        q = Polygon([(qx - qh, qy), (qx, qy + qh),
                     (qx + qh, qy), (qx, qy - qh)])
        got = geometry_intersects_polygon(geom, q)
        # dense grid over the geometry square
        xs = np.linspace(ax - ah, ax + ah, 9)
        ys = np.linspace(ay - ah, ay + ah, 9)
        gx, gy = np.meshgrid(xs, ys)
        inside_q = _raycast(gx.ravel(), gy.ravel(), q)
        if inside_q.any():  # a shared point exists -> must intersect
            assert got, (ax, ay, ah, qx, qy, qh)
        # bbox-disjoint -> exact must be disjoint
        if (ax + ah < qx - qh or qx + qh < ax - ah
                or ay + ah < qy - qh or qy + qh < ay - ah):
            assert not got

    prop()


def test_degenerate_shell_polygon_is_empty():
    """A POLYGON whose ring 0 (the shell, by WKB position) is degenerate
    is EMPTY — a later hole ring must never be promoted to shell, which
    would invert the hole's interior into polygon interior."""
    import struct as _st

    from iceberg_spark.geo import Polygon, geometry_intersects_polygon

    def ring(pts):
        b = _st.pack("<I", len(pts))
        for x, y in pts:
            b += _st.pack("<dd", x, y)
        return b

    wkb = (_st.pack("<BII", 1, 3, 2)
           + ring([(0, 0), (1, 1)])  # 2-point shell: degenerate
           + ring([(2, 2), (8, 2), (8, 8), (2, 8), (2, 2)]))  # "hole"
    q = Polygon([(3, 3), (7, 3), (7, 7), (3, 7)])  # inside the "hole"
    assert not geometry_intersects_polygon(wkb, q)


def test_sph_kernel_matches_plane_sign_oracle():
    """Crossing-parity membership == edge-plane sign algebra for convex
    spherical triangles, vectorized and scalar paths alike, over a
    deterministic random sample — including an antimeridian-wrapping
    quad."""
    import numpy as np

    from iceberg_spark.geo import (SphPolygon, _sph_points_in_polygon,
                                   _sph_xyz, sph_point_in_polygon)

    rng = np.random.default_rng(11)
    lons = rng.uniform(-180, 180, 5000)
    lats = rng.uniform(-89.5, 89.5, 5000)

    for ring in ([(-60.0, 40.0), (60.0, 40.0), (0.0, 70.0)],
                 [(150.0, -10.0), (-150.0, -10.0), (-150.0, 30.0),
                  (150.0, 30.0)],
                 [(-100.37, 5.73), (20.41, 11.19), (-40.11, 69.57)]):
        sp = SphPolygon(ring)
        V = [_sph_xyz(float(x), float(y)) for x, y in ring]
        ctr = sum(V) / len(V)
        n_ref = [(np.cross(V[i], V[(i + 1) % len(V)]),
                  np.sign(float(np.dot(np.cross(V[i], V[(i + 1) % len(V)]),
                                       ctr))))
                 for i in range(len(V))]
        exp = np.array([
            all(np.sign(float(np.dot(n, _sph_xyz(lo, la)))) == r
                for n, r in n_ref)
            for lo, la in zip(lons, lats)])
        got = _sph_points_in_polygon(lons, lats, sp)
        assert (got == exp).all(), ring
        sc = np.array([sph_point_in_polygon(_sph_xyz(lo, la), sp)
                       for lo, la in zip(lons[:300], lats[:300])])
        assert (sc == got[:300]).all(), ring


def test_geography_intersects_all_wkb_kinds():
    from iceberg_spark.geo import (SphPolygon,
                                   geography_intersects_polygon,
                                   wkb_linestring, wkb_point, wkb_polygon)

    sp = SphPolygon([(-60.0, 40.0), (60.0, 40.0), (0.0, 70.0)])
    assert geography_intersects_polygon(wkb_point(0, 60), sp)
    assert not geography_intersects_polygon(wkb_point(0, 45), sp)
    assert geography_intersects_polygon(
        wkb_linestring([(0, 0), (0, 65)]), sp)       # crosses the bulge
    assert not geography_intersects_polygon(
        wkb_linestring([(0, 0), (0, 50)]), sp)       # stays under it
    assert geography_intersects_polygon(
        wkb_polygon([(-5, 50), (5, 50), (0, 60)]), sp)   # edge-crossing
    assert not geography_intersects_polygon(
        wkb_polygon([(-5, 30), (5, 30), (0, 45)]), sp)   # under the bulge
    # data polygon CONTAINING the whole query triangle still intersects
    # (the quad dips at lon 0 to compensate its own bottom-edge bulge;
    # the naive wide triangle (-90,20),(90,20),(0,88) does NOT contain
    # the query — its 140-degree bottom edge arcs over the north pole)
    assert geography_intersects_polygon(
        wkb_polygon([(-90, 30), (0, 20), (90, 30), (0, 85)]), sp)
    assert not geography_intersects_polygon(
        wkb_polygon([(-90, 20), (90, 20), (0, 88)]), sp)
    # data polygon strictly INSIDE the query (no edge crossings)
    assert geography_intersects_polygon(
        wkb_polygon([(-5, 61), (5, 61), (0, 66)]), sp)
    assert not geography_intersects_polygon(None, sp)


def test_sph_polygon_bbox_wrap_and_bulge():
    from iceberg_spark.geo import BBox, SphPolygon, sph_polygon_bbox

    quad = [(150.0, -10.0), (-150.0, -10.0), (-150.0, 30.0),
            (150.0, 30.0)]
    bb = sph_polygon_bbox(SphPolygon(quad), quad)
    assert bb.xmin == 150.0 and bb.xmax == -150.0  # wraps the antimeridian
    assert bb.ymin < -10.0 and bb.ymax > 30.0  # geodesic bulge both ways
    # pole-containing cap: full longitude range, lat to the pole
    cap = [(0.0, 80.0), (90.0, 80.0), (180.0, 80.0), (-90.0, 80.0)]
    bc = sph_polygon_bbox(SphPolygon(cap), cap)
    assert (bc.xmin, bc.xmax, bc.ymax) == (-180.0, 180.0, 90.0)
    assert abs(bc.ymin - 80.0) < 1e-9


def test_sph_near_hemisphere_refused():
    from iceberg_spark.geo import SphPolygon

    # vertex mean ~0: equally spaced equatorial ring
    with pytest.raises(NotImplementedError, match="hemisphere"):
        SphPolygon([(0.0, 0.0), (120.0, 0.0), (-120.0, 0.0)])
