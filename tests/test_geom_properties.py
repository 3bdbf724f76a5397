"""Property-based tests (hypothesis) for the WKB geometry kernel — the
random-input robustness layer on top of the example-based suites."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from gdal_spark.oracle import geom as G

COORD = st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False)


def _convex(seed, n_pts=12, scale=100.0, off=(0.0, 0.0)):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-scale, scale, (n_pts, 2)) + np.asarray(off)
    ring = G.convex_hull(pts)
    return ring if ring.shape[0] >= 4 else None


def _star_shaped(seed, n=10, scale=100.0):
    """Simple (star-shaped) polygon: random radii at jittered angles.
    Angular gaps are kept < pi (evenly spaced + bounded jitter) — with a
    gap over pi the closing chord crosses the far side and the ring
    self-intersects (hypothesis found exactly that with fully random
    sorted angles)."""
    rng = np.random.default_rng(seed)
    step = 2 * np.pi / n
    ang = np.arange(n) * step + rng.uniform(-0.3, 0.3, n) * step
    rad = rng.uniform(0.2 * scale, scale, n)
    ring = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
    return np.vstack([ring, ring[:1]])


class TestWkbRoundTrip:
    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.tuples(COORD, COORD), min_size=1, max_size=8),
           st.sampled_from(["point", "multipoint", "linestring"]))
    def test_point_line_roundtrip(self, coords, kind):
        arr = np.asarray(coords, dtype=np.float64)
        if kind == "point":
            g = ("point", arr[0])
        elif kind == "multipoint":
            g = ("multipoint", arr)
        else:
            if arr.shape[0] < 2:
                return
            g = ("linestring", arr)
        rt = G.parse_wkb(G.to_wkb(*g))
        assert rt[0] == g[0]
        np.testing.assert_array_equal(np.asarray(rt[1]).reshape(-1, 2),
                                      np.asarray(g[1]).reshape(-1, 2))

    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 10_000))
    def test_polygon_roundtrip(self, seed):
        ring = _convex(seed)
        if ring is None:
            return
        hole = _convex(seed + 1, scale=10.0)
        rings = [ring] + ([hole] if hole is not None else [])
        g = ("polygon", rings)
        rt = G.parse_wkb(G.to_wkb(*g))
        assert rt[0] == "polygon" and len(rt[1]) == len(rings)
        for a, b in zip(rt[1], rings):
            np.testing.assert_array_equal(a, b)


class TestWkbZMAndCurves:
    """ISO/EWKB Z/M variants parse with ordinates dropped; curved types
    stroke to linear geometry (ogr_core.h:426-512 type table,
    ogrgeometryfactory.cpp curveToLineString)."""

    @staticmethod
    def _wkb(gtype, payload):
        import struct
        return struct.pack("<BI", 1, gtype) + payload

    def test_point_z_m_zm(self):
        import struct
        for gtype, vals in [(1001, (3.0, 4.0, 9.0)),
                            (2001, (3.0, 4.0, 7.0)),
                            (3001, (3.0, 4.0, 9.0, 7.0))]:
            b = self._wkb(gtype, struct.pack(f"<{len(vals)}d", *vals))
            kind, d = G.parse_wkb(b)
            assert kind == "point" and tuple(d) == (3.0, 4.0)

    def test_ewkb_flags_with_srid(self):
        import struct
        raw = 1 | 0x80000000 | 0x20000000   # EWKB point + Z + SRID
        b = struct.pack("<BII", 1, raw, 4326) + struct.pack("<3d", 1, 2, 5)
        kind, d = G.parse_wkb(b)
        assert kind == "point" and tuple(d) == (1.0, 2.0)

    def test_linestring_z_length(self):
        import struct
        pts = [(0, 0, 10), (3, 4, 20), (3, 8, 30)]
        payload = struct.pack("<I", len(pts)) + b"".join(
            struct.pack("<3d", *p) for p in pts)
        kind, d = G.parse_wkb(self._wkb(1002, payload))
        assert kind == "linestring"
        assert G.length((kind, d)) == pytest.approx(9.0)  # 2-D length

    def test_circularstring_semicircle(self):
        import struct
        pts = [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]
        payload = struct.pack("<I", 3) + b"".join(
            struct.pack("<2d", *p) for p in pts)
        kind, d = G.parse_wkb(self._wkb(8, payload))
        assert kind == "linestring" and len(d) > 20
        assert G.length((kind, d)) == pytest.approx(np.pi, rel=1e-3)
        np.testing.assert_allclose(d[0], [0, 0])
        np.testing.assert_allclose(d[-1], [2, 0])
        # all stroked points on the unit circle centered (1, 0)
        r = np.hypot(d[:, 0] - 1.0, d[:, 1])
        np.testing.assert_allclose(r, 1.0, atol=1e-9)

    def test_curvepolygon_circle_area(self):
        import struct
        pts = [(1.0, 0.0), (0.0, 1.0), (-1.0, 0.0), (0.0, -1.0), (1.0, 0.0)]
        cs = self._wkb(8, struct.pack("<I", 5) + b"".join(
            struct.pack("<2d", *p) for p in pts))
        cp = self._wkb(10, struct.pack("<I", 1) + cs)
        kind, d = G.parse_wkb(cp)
        assert kind == "polygon"
        assert G.area((kind, d)) == pytest.approx(np.pi, rel=1e-3)

    def test_compoundcurve_chains(self):
        import struct
        seg = self._wkb(2, struct.pack("<I", 2) + struct.pack("<4d", 0, 0, 1, 0))
        arc = self._wkb(8, struct.pack("<I", 3)
                        + struct.pack("<6d", 1, 0, 2, 1, 3, 0))
        cc = self._wkb(9, struct.pack("<I", 2) + seg + arc)
        kind, d = G.parse_wkb(cc)
        assert kind == "linestring"
        np.testing.assert_allclose(d[0], [0, 0])
        np.testing.assert_allclose(d[-1], [3, 0])
        assert G.length((kind, d)) == pytest.approx(1.0 + np.pi, rel=1e-3)

    def test_tin_z_as_multipolygon(self):
        import struct
        def tri(p0, p1, p2):
            ring = [p0, p1, p2, p0]
            return self._wkb(1017, struct.pack("<I", 1)
                             + struct.pack("<I", 4)
                             + b"".join(struct.pack("<3d", *p) for p in ring))
        t = self._wkb(1016, struct.pack("<I", 2)
                      + tri((0, 0, 1), (1, 0, 2), (0, 1, 3))
                      + tri((1, 0, 1), (1, 1, 2), (0, 1, 3)))
        kind, d = G.parse_wkb(t)
        assert kind == "multipolygon" and len(d) == 2
        assert G.area((kind, d)) == pytest.approx(1.0)


class TestConvexOverlayProperties:
    @settings(max_examples=50, deadline=None)
    @given(st.integers(0, 10_000), st.integers(0, 10_000),
           st.floats(-120, 120), st.floats(-120, 120))
    def test_clip_bounded_symmetric_conserving(self, s1, s2, dx, dy):
        a = _convex(s1)
        b = _convex(s2, off=(dx, dy))
        if a is None or b is None:
            return
        area_a = abs(G._ring_signed_area(a))
        area_b = abs(G._ring_signed_area(b))
        inter_ab = G.convex_intersection_area(a, b)
        inter_ba = G.convex_intersection_area(b, a)
        tol = 1e-9 * max(area_a, area_b, 1.0)
        # bounded above by both inputs, symmetric in its arguments
        assert inter_ab <= min(area_a, area_b) + tol
        assert abs(inter_ab - inter_ba) <= tol
        # conservation: a = (a ∩ b) + (a − b).  subtract_convex collapses
        # slivers thinner than _EPS*scale by design (_dedupe_ring), so the
        # identity may miss by up to perimeter * that width.
        remainder = sum(abs(G._ring_signed_area(p))
                        for p in G.subtract_convex(a, b))
        closed = np.vstack([a, a[:1]])
        perimeter = float(np.hypot(*np.diff(closed, axis=0).T).sum())
        scale = max(1.0, float(np.abs(a).max()), float(np.abs(b).max()))
        sliver_tol = perimeter * 1e-9 * scale
        assert abs(inter_ab + remainder - area_a) <= tol + sliver_tol

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 10_000), st.integers(0, 10_000),
           st.floats(-150, 150), st.floats(-150, 150))
    def test_predicate_consistency(self, s1, s2, dx, dy):
        ra = _convex(s1)
        rb = _convex(s2, off=(dx, dy))
        if ra is None or rb is None:
            return
        a = ("polygon", [ra])
        b = ("polygon", [rb])
        inter = G.intersects(a, b)
        assert G.disjoint(a, b) == (not inter)
        if G.within(a, b):
            assert inter
            assert G.contains(b, a)
        if G.touches(a, b):
            assert inter and not G.overlaps(a, b)
        if G.overlaps(a, b):
            assert inter and not G.within(a, b) and not G.within(b, a)
        assert G.equals(a, a)
        assert G.intersects(a, a) and not G.disjoint(a, a)
        # distance is 0 iff intersecting (strictly positive when disjoint)
        d = G.distance(a, b)
        if inter:
            assert d == 0.0
        else:
            assert d > 0.0


class TestDecompositionProperties:
    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 10_000))
    def test_triangulation_covers_star_polygon(self, seed):
        ring = _star_shaped(seed)
        area = abs(G._ring_signed_area(ring))
        tris = G.triangulate_ring(ring)
        cover = sum(abs(G._ring_signed_area(t)) for t in tris)
        assert cover == pytest.approx(area, rel=1e-6)

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 10_000), st.integers(0, 10_000),
           st.floats(-80, 80), st.floats(-80, 80))
    def test_nonconvex_overlay_conservation(self, s1, s2, dx, dy):
        a = ("polygon", [_star_shaped(s1)])
        rb = _convex(s2, off=(dx, dy))
        if rb is None:
            return
        b = ("polygon", [rb])
        area_a = G.area(a)
        inter = G.polygon_intersection_area(a, b)
        diff = sum(abs(G._ring_signed_area(p))
                   for p in G.polygon_difference_pieces(a, b))
        assert inter + diff == pytest.approx(area_a, rel=1e-6)
        assert inter <= min(area_a, G.area(b)) * (1 + 1e-9) + 1e-9


class TestConstructionProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 10_000), st.floats(1.0, 50.0))
    def test_buffer_grows_simplify_shrinks(self, seed, dist):
        ring = _convex(seed)
        if ring is None:
            return
        g = ("polygon", [ring])
        buffered = G.buffer_geom(g, float(dist))
        assert G.area(buffered) >= G.area(g)
        # the original's vertices lie inside the buffer
        assert G.points_in_geom(ring[:-1, 0], ring[:-1, 1], buffered).all()
        simp = G.simplify_geom(g, 1e-9)
        assert G.n_points(simp) <= G.n_points(g)
        assert G.area(simp) == pytest.approx(G.area(g), rel=1e-6)
