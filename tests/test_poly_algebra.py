"""Convex-polygon layer algebra vs the rectangle fast path and closed-form
diamond (45°-rotated square) oracles."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.oracle import geom as G


def _diamond_wkb(cx, cy, s):
    ring = np.array(
        [[cx + s, cy], [cx, cy + s], [cx - s, cy], [cx, cy - s], [cx + s, cy]]
    )
    return G.to_wkb("polygon", [ring])


def _rect_wkb(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
    return G.to_wkb("polygon", [ring])


@pytest.fixture(scope="module")
def rect_layers_wkb(spark):
    rng = np.random.default_rng(11)
    a = pd.DataFrame({
        "aid": np.arange(40, dtype=np.int64),
        "minx": rng.uniform(-5e6, 5e6, 40),
        "miny": rng.uniform(-5e6, 5e6, 40),
    })
    a["maxx"] = a.minx + rng.uniform(2e5, 2e6, 40)
    a["maxy"] = a.miny + rng.uniform(2e5, 2e6, 40)
    b = pd.DataFrame({
        "bid": np.arange(15, dtype=np.int64),
        "minx": rng.uniform(-5e6, 5e6, 15),
        "miny": rng.uniform(-5e6, 5e6, 15),
    })
    b["maxx"] = b.minx + rng.uniform(5e5, 3e6, 15)
    b["maxy"] = b.miny + rng.uniform(5e5, 3e6, 15)
    a["wkb"] = [_rect_wkb(*t) for t in zip(a.minx, a.miny, a.maxx, a.maxy)]
    b["wkb"] = [_rect_wkb(*t) for t in zip(b.minx, b.miny, b.maxx, b.maxy)]
    return spark.createDataFrame(a), spark.createDataFrame(b), a, b


class TestPolyVsRectPath:
    def test_intersection_matches_rect_fast_path(self, spark, rect_layers_wkb):
        from gdal_spark.operators.layer_algebra import (
            intersection, poly_intersection, rect_area,
        )

        sa, sb, pa, pb = rect_layers_wkb
        rect = rect_area(
            intersection(sa.drop("wkb"), sb.drop("wkb"))
        ).select("aid", "bid", "area").toPandas()
        poly = poly_intersection(
            sa.select("aid", "wkb"), sb.select("bid", "wkb")
        ).select("aid", "bid", "area").toPandas()
        rect = rect.sort_values(["aid", "bid"], ignore_index=True)
        poly = poly.sort_values(["aid", "bid"], ignore_index=True)
        assert len(rect) == len(poly) > 0
        assert (rect.aid == poly.aid).all() and (rect.bid == poly.bid).all()
        np.testing.assert_allclose(rect.area, poly.area, rtol=1e-9)

    def test_erase_area_conservation(self, spark, rect_layers_wkb):
        """area(a) == erase remainder + sum of single-coverage intersection
        areas, checked where no two b rects overlap the same a twice-over
        (conservation on the union; we verify with the inclusion bound)."""
        from gdal_spark.operators.layer_algebra import (
            poly_erase, poly_intersection,
        )

        sa, sb, pa, pb = rect_layers_wkb
        er = poly_erase(sa.select("aid", "wkb"), sb.select("bid", "wkb"))
        got = er.select("aid", "area", "n_pieces").toPandas()
        assert len(got) == len(pa)
        full = (pa.maxx - pa.minx) * (pa.maxy - pa.miny)
        full.index = pa.aid
        inter = poly_intersection(
            sa.select("aid", "wkb"), sb.select("bid", "wkb")
        ).toPandas()
        isum = inter.groupby("aid")["area"].sum()
        for r in got.itertuples(index=False):
            fa = full[r.aid]
            cut = isum.get(r.aid, 0.0)
            tol = 1e-9 * fa  # clip interpolation noise at 1e12 m^2 scales
            assert r.area <= fa + tol
            # remainder >= area - total cut (equality when b's don't overlap
            # each other inside a; the bound holds always)
            assert r.area >= fa - cut - tol


class TestDiamondOverlay:
    def test_diamond_intersection_closed_form(self, spark):
        """Generic S-H clip vs the rotated-coordinate closed form:
        diamonds are axis-aligned squares in (u,v) = (x+y, x-y); the
        intersection area in xy = u-overlap * v-overlap / 2."""
        from gdal_spark.operators.layer_algebra import poly_intersection

        rng = np.random.default_rng(5)
        ca = rng.uniform(-1e6, 1e6, (30, 2))
        sa = rng.uniform(2e5, 8e5, 30)
        cb = rng.uniform(-1e6, 1e6, (12, 2))
        sb = rng.uniform(3e5, 1e6, 12)
        a = spark.createDataFrame(pd.DataFrame({
            "aid": np.arange(30, dtype=np.int64),
            "wkb": [_diamond_wkb(c[0], c[1], s) for c, s in zip(ca, sa)],
        }))
        b = spark.createDataFrame(pd.DataFrame({
            "bid": np.arange(12, dtype=np.int64),
            "wkb": [_diamond_wkb(c[0], c[1], s) for c, s in zip(cb, sb)],
        }))
        got = poly_intersection(a, b).toPandas()
        # numpy closed-form oracle over all pairs
        ua, va = ca[:, 0] + ca[:, 1], ca[:, 0] - ca[:, 1]
        ub, vb = cb[:, 0] + cb[:, 1], cb[:, 0] - cb[:, 1]
        exp = {}
        for i in range(30):
            for j in range(12):
                du = min(ua[i] + sa[i], ub[j] + sb[j]) - max(ua[i] - sa[i], ub[j] - sb[j])
                dv = min(va[i] + sa[i], vb[j] + sb[j]) - max(va[i] - sa[i], vb[j] - sb[j])
                if du > 0 and dv > 0:
                    exp[(i, j)] = du * dv / 2.0
        assert set(zip(got.aid, got.bid)) == set(exp)
        for r in got.itertuples(index=False):
            assert r.area == pytest.approx(exp[(r.aid, r.bid)], rel=1e-9)

    def test_nonconvex_intersection(self, spark):
        """Concave (L-shaped) inputs run through the ear-clipping
        decomposition path and match the kernel-level overlay area."""
        from gdal_spark.operators.layer_algebra import poly_intersection

        def L_wkb(ox, oy, s):
            ring = np.array([
                (0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10), (0, 0)
            ], float) * s + (ox, oy)
            return G.to_wkb("polygon", [ring])

        a = spark.createDataFrame(pd.DataFrame({
            "aid": np.arange(6, dtype=np.int64),
            "wkb": [L_wkb(i * 3.0, 0.0, 1e5) for i in range(6)],
        }))
        b = spark.createDataFrame(pd.DataFrame({
            "bid": np.arange(3, dtype=np.int64),
            "wkb": [_diamond_wkb(5e5 + i * 2e5, 4e5, 4e5) for i in range(3)],
        }))
        got = poly_intersection(a, b).toPandas()
        assert len(got) > 0
        adf = a.toPandas().set_index("aid")
        bdf = b.toPandas().set_index("bid")
        for r in got.itertuples(index=False):
            ga = G.parse_wkb(bytes(adf.loc[r.aid, "wkb"]))
            gb = G.parse_wkb(bytes(bdf.loc[r.bid, "wkb"]))
            exp = G.polygon_intersection_area(ga, gb)
            assert r.area == pytest.approx(exp, rel=1e-9)
            # emitted geometry's own area agrees
            assert G.area(G.parse_wkb(bytes(r.wkb))) == pytest.approx(exp, rel=1e-9)

    def test_nonconvex_erase_conservation(self, spark):
        from gdal_spark.operators.layer_algebra import (
            poly_erase, poly_intersection,
        )

        ring = np.array([
            (0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10), (0, 0)
        ], float) * 1e5
        a = spark.createDataFrame(pd.DataFrame({
            "aid": [0], "wkb": [G.to_wkb("polygon", [ring])],
        }))
        b = spark.createDataFrame(pd.DataFrame({
            "bid": [0], "wkb": [_diamond_wkb(5e5, 2e5, 3e5)],
        }))
        inter = poly_intersection(a, b).toPandas()["area"].sum()
        er = poly_erase(a, b).toPandas()
        assert len(er) == 1
        assert er["area"].iloc[0] + inter == pytest.approx(64 * 1e10, rel=1e-9)

    def test_union_coverage_total(self, spark):
        from gdal_spark.operators.layer_algebra import poly_union

        a = spark.createDataFrame(pd.DataFrame({
            "aid": [0, 1], "wkb": [_diamond_wkb(0, 0, 10), _diamond_wkb(100, 0, 5)],
        }))
        b = spark.createDataFrame(pd.DataFrame({
            "bid": [0], "wkb": [_diamond_wkb(5, 0, 10)],
        }))
        got = poly_union(a, b).toPandas()
        # total area of disjoint decomposition = |A ∪ B| summed per pair
        # semantics: inter(0,0) + a0-remainder + a1 (whole) + b0-remainder
        inter = got[(got.aid == 0) & (got.bid == 0)].area.sum()
        total = got.area.sum()
        # diamonds s=10 at (0,0) and (5,0): u/v overlap 15 -> inter 112.5
        assert inter == pytest.approx(112.5)
        assert total == pytest.approx(200 + 50 + 200 - 112.5)


class TestDissolve:
    def test_dissolve_union_area(self, spark):
        """Dissolved area = |union|: overlapping rects counted once,
        disjoint rects summed, concave members handled."""
        from gdal_spark.operators.layer_algebra import dissolve

        L = np.array([(0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10),
                      (0, 0)], float)
        rows = [
            # group 0: two overlapping unit-1e5 squares (50% overlap)
            (0, _rect_wkb(0, 0, 10, 10)),
            (0, _rect_wkb(5, 0, 15, 10)),
            # group 1: disjoint squares
            (1, _rect_wkb(0, 0, 10, 10)),
            (1, _rect_wkb(20, 0, 30, 10)),
            # group 2: L-shape + square filling its notch
            (2, G.to_wkb("polygon", [L])),
            (2, _rect_wkb(4, 4, 10, 10)),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["gid", "wkb"])
        )
        got = dissolve(df, "gid").toPandas().set_index("gid")
        assert got.loc[0, "area"] == pytest.approx(150.0)
        assert got.loc[1, "area"] == pytest.approx(200.0)
        assert got.loc[2, "area"] == pytest.approx(100.0)  # L + notch = full
        # emitted geometry's own area agrees with the reported area
        for gid in (0, 1, 2):
            g = G.parse_wkb(bytes(got.loc[gid, "wkb"]))
            assert G.area(g) == pytest.approx(got.loc[gid, "area"], rel=1e-9)


class TestGreinerHormann:
    def test_gh_unit_cases(self):
        import numpy as np

        from gdal_spark.oracle import geom as G

        sq = lambda x0, y0, x1, y1: np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
        r = G.gh_intersection(sq(0, 0, 4, 4), sq(2, 2, 6, 6))
        assert len(r) == 1
        assert abs(G._ring_signed_area(r[0])) == pytest.approx(4.0)
        # containment -> inner polygon, disjoint -> empty
        assert abs(G._ring_signed_area(
            G.gh_intersection(sq(0, 0, 10, 10), sq(2, 2, 4, 4))[0]
        )) == pytest.approx(4.0)
        assert G.gh_intersection(sq(0, 0, 1, 1), sq(5, 5, 6, 6)) == []
        # shared edge is degenerate -> None (fallback contract)
        assert G.gh_intersection(sq(0, 0, 4, 4), sq(4, 0, 8, 4)) is None
        # concave L vs square: two separate intersection regions
        L = np.array([[0, 0], [6, 0], [6, 2], [2, 2], [2, 6], [0, 6], [0, 0]],
                     float)
        sq2 = np.array([[1, 1], [5, 1], [5, 5], [1, 5], [1, 1]], float)
        r = G.gh_intersection(L, sq2)
        assert sum(abs(G._ring_signed_area(p)) for p in r) == pytest.approx(7.0)

    def test_gh_matches_decomposition_on_random_simple(self):
        """Property: on random SIMPLE polygons the direct Greiner-Hormann
        clip and the ear-clip decomposition agree to 1e-6 relative (or GH
        declares degeneracy and falls back)."""
        import numpy as np

        from gdal_spark.oracle import geom as G

        def is_simple(R):
            r = R[:-1]
            n = len(r)
            for i in range(n):
                p1, p2 = r[i], r[(i + 1) % n]
                dp = p2 - p1
                for j in range(i + 1, n):
                    if j == i or (j + 1) % n == i or (i + 1) % n == j:
                        continue
                    q1, q2 = r[j], r[(j + 1) % n]
                    dq = q2 - q1
                    den = dp[0] * dq[1] - dp[1] * dq[0]
                    if abs(den) < 1e-14:
                        continue
                    w = q1 - p1
                    t = (w[0] * dq[1] - w[1] * dq[0]) / den
                    s = (w[0] * dp[1] - w[1] * dp[0]) / den
                    if 0 < t < 1 and 0 < s < 1:
                        return False
            return True

        rng = np.random.default_rng(0)

        def rand_simple():
            while True:
                k = rng.integers(3, 10)
                ang = np.sort(rng.uniform(0, 2 * np.pi, k))
                rad = rng.uniform(0.5, 3.0, k)
                c = rng.uniform(-2, 2, 2)
                pts = np.stack(
                    [c[0] + rad * np.cos(ang), c[1] + rad * np.sin(ang)], 1)
                P = np.vstack([pts, pts[:1]])
                if abs(G._ring_signed_area(P)) > 0.05 and is_simple(P):
                    return P

        checked = 0
        for _ in range(120):
            A, B = rand_simple(), rand_simple()
            res = G.gh_intersection(A, B)
            if res is None:
                continue
            pa = G.decompose_convex(("polygon", [A]))
            pb = G.decompose_convex(("polygon", [B]))
            exp = sum(
                abs(G._ring_signed_area(G.clip_convex(ta, tb)))
                if G.clip_convex(ta, tb).shape[0] >= 4 else 0.0
                for ta in pa for tb in pb)
            got = sum(abs(G._ring_signed_area(p)) for p in res)
            assert got == pytest.approx(exp, rel=1e-6, abs=1e-9)
            checked += 1
        assert checked > 100

    def test_gh_difference_matches_decomposition(self):
        """gh_difference == the sequential convex-subtract decomposition
        on random simple polygons (or falls back via None)."""
        import numpy as np

        from gdal_spark.oracle import geom as G

        sq = lambda x0, y0, x1, y1: np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
        r = G.gh_difference(sq(0, 0, 4, 4), sq(2, 2, 6, 6))
        assert sum(abs(G._ring_signed_area(p)) for p in r) == pytest.approx(12.0)
        assert G.gh_difference(sq(2, 2, 3, 3), sq(0, 0, 10, 10)) == []
        # hole-producing containment must fall back
        assert G.gh_difference(sq(0, 0, 10, 10), sq(2, 2, 3, 3)) is None

        rng = np.random.default_rng(3)

        def rand_simple():
            while True:
                k = rng.integers(3, 10)
                ang = np.sort(rng.uniform(0, 2 * np.pi, k))
                rad = rng.uniform(0.5, 3.0, k)
                c = rng.uniform(-2, 2, 2)
                pts = np.stack(
                    [c[0] + rad * np.cos(ang), c[1] + rad * np.sin(ang)], 1)
                P = np.vstack([pts, pts[:1]])
                if abs(G._ring_signed_area(P)) <= 0.05:
                    continue
                rr = P[:-1]
                n = len(rr)
                ok = True
                for i in range(n):
                    p1, p2 = rr[i], rr[(i + 1) % n]
                    dp = p2 - p1
                    for j in range(i + 1, n):
                        if j == i or (j + 1) % n == i or (i + 1) % n == j:
                            continue
                        q1, q2 = rr[j], rr[(j + 1) % n]
                        dq = q2 - q1
                        den = dp[0] * dq[1] - dp[1] * dq[0]
                        if abs(den) < 1e-14:
                            continue
                        w = q1 - p1
                        t = (w[0] * dq[1] - w[1] * dq[0]) / den
                        s = (w[0] * dp[1] - w[1] * dp[0]) / den
                        if 0 < t < 1 and 0 < s < 1:
                            ok = False
                if ok:
                    return P

        checked = 0
        for _ in range(100):
            A, B = rand_simple(), rand_simple()
            d = G.gh_difference(A, B)
            if d is None:
                continue
            pieces = G.decompose_convex(("polygon", [A]))
            for tb in G.decompose_convex(("polygon", [B])):
                nxt = []
                for p in pieces:
                    nxt.extend(G.subtract_convex(p, tb))
                pieces = nxt
            exp = sum(abs(G._ring_signed_area(p)) for p in pieces)
            got = sum(abs(G._ring_signed_area(p)) for p in d)
            assert got == pytest.approx(exp, rel=1e-6, abs=1e-9)
            checked += 1
        assert checked > 80

    def test_gh_union_property(self):
        """gh_union area == |A| + |B| - |A∩B| on random simple polygons;
        hole-producing interlocks fall back (None)."""
        import numpy as np

        from gdal_spark.oracle import geom as G

        sq = lambda x0, y0, x1, y1: np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
        u = G.gh_union(sq(0, 0, 4, 4), sq(2, 2, 6, 6))
        assert sum(abs(G._ring_signed_area(p)) for p in u) == pytest.approx(28.0)
        assert len(G.gh_union(sq(0, 0, 1, 1), sq(5, 5, 6, 6))) == 2
        U = np.array([[0, 0], [10, 0], [10, 6], [7, 6], [7, 2], [3, 2],
                      [3, 6], [0, 6], [0, 0]], float)
        cap = np.array([[1, 4], [9, 4], [9, 8], [1, 8], [1, 4]], float)
        assert G.gh_union(U, cap) is None  # enclosed hole -> fallback

        rng = np.random.default_rng(4)

        def rand_simple():
            while True:
                k = rng.integers(3, 10)
                ang = np.sort(rng.uniform(0, 2 * np.pi, k))
                rad = rng.uniform(0.5, 3.0, k)
                c = rng.uniform(-2, 2, 2)
                pts = np.stack(
                    [c[0] + rad * np.cos(ang), c[1] + rad * np.sin(ang)], 1)
                P = np.vstack([pts, pts[:1]])
                if abs(G._ring_signed_area(P)) <= 0.05:
                    continue
                rr = P[:-1]
                n = len(rr)
                simple = True
                for i in range(n):
                    p1, p2 = rr[i], rr[(i + 1) % n]
                    dp = p2 - p1
                    for j in range(i + 1, n):
                        if (j + 1) % n == i or (i + 1) % n == j:
                            continue
                        q1, q2 = rr[j], rr[(j + 1) % n]
                        dq = q2 - q1
                        den = dp[0] * dq[1] - dp[1] * dq[0]
                        if abs(den) < 1e-14:
                            continue
                        w = q1 - p1
                        t = (w[0] * dq[1] - w[1] * dq[0]) / den
                        sp = (w[0] * dp[1] - w[1] * dp[0]) / den
                        if 0 < t < 1 and 0 < sp < 1:
                            simple = False
                if simple:
                    return P

        checked = 0
        for _ in range(60):
            A, B = rand_simple(), rand_simple()
            u = G.gh_union(A, B)
            inter = G.gh_intersection(A, B)
            if u is None or inter is None:
                continue
            got = sum(abs(G._ring_signed_area(p)) for p in u)
            exp = (abs(G._ring_signed_area(A)) + abs(G._ring_signed_area(B))
                   - sum(abs(G._ring_signed_area(p)) for p in inter))
            assert got == pytest.approx(exp, rel=1e-6, abs=1e-9)
            checked += 1
        assert checked > 40

    def test_gh_polygon_pieces_with_holes(self):
        """Composed Greiner-Hormann boolean on hole-bearing polygons
        matches the ear-clip decomposition oracle: intersection and
        difference areas agree to 1e-6 relative on random
        square-with-hole pairs (or the composition declares degeneracy
        and returns None)."""
        import numpy as np

        from gdal_spark.oracle import geom as G

        def sq(x0, y0, x1, y1):
            return np.array(
                [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)

        def decomp_inter_area(a, b):
            pa = G.decompose_convex(a)
            pb = G.decompose_convex(b)
            tot = 0.0
            for ta in pa:
                for tb in pb:
                    c = G.clip_convex(ta, tb)
                    if c.shape[0] >= 4:
                        tot += abs(G._ring_signed_area(c))
            return tot

        def poly_area(g):
            rings = g[1]
            return (abs(G._ring_signed_area(rings[0]))
                    - sum(abs(G._ring_signed_area(h)) for h in rings[1:]))

        # deterministic case: offset squares, each with a hole that
        # straddles the intersection boundary (a hole wholly inside the
        # overlap would need a hole in the single-ring output, which is
        # the documented None-fallback — exercised in the random loop)
        A = ("polygon", [sq(0, 0, 10, 10), sq(4, 4, 6, 6)])
        B = ("polygon", [sq(5, 1, 15, 11), sq(9, 3, 11.5, 5)])
        inter = G.gh_polygon_pieces(A, B, "intersection")
        assert inter is not None
        got = sum(abs(G._ring_signed_area(p)) for p in inter)
        assert got == pytest.approx(decomp_inter_area(A, B), rel=1e-9)
        diff = G.gh_polygon_pieces(A, B, "difference")
        assert diff is not None
        gotd = sum(abs(G._ring_signed_area(p)) for p in diff)
        assert gotd == pytest.approx(poly_area(A) - got, rel=1e-9)
        # hole wholly inside the overlap -> composition declines
        Bc = ("polygon", [sq(5, 1, 15, 11), sq(7, 3, 9, 5)])
        assert G.gh_polygon_pieces(A, Bc, "intersection") is None

        rng = np.random.default_rng(11)
        checked_i = checked_d = 0
        for _ in range(120):
            ax, ay = rng.uniform(-3, 3, 2)
            bx, by = rng.uniform(-3, 3, 2)
            aw, bw = rng.uniform(3, 6, 2)
            Ao = sq(ax, ay, ax + aw, ay + aw)
            Bo = sq(bx, by, bx + bw, by + bw)
            # holes strictly inside each outer, off-grid offsets
            Ah = sq(ax + 0.31 * aw, ay + 0.27 * aw,
                    ax + 0.63 * aw, ay + 0.59 * aw)
            Bh = sq(bx + 0.22 * bw, by + 0.38 * bw,
                    bx + 0.54 * bw, by + 0.71 * bw)
            A = ("polygon", [Ao, Ah])
            B = ("polygon", [Bo, Bh])
            exp_i = decomp_inter_area(A, B)
            inter = G.gh_polygon_pieces(A, B, "intersection")
            if inter is not None:
                got = sum(abs(G._ring_signed_area(p)) for p in inter)
                assert got == pytest.approx(exp_i, rel=1e-6, abs=1e-9)
                checked_i += 1
            diff = G.gh_polygon_pieces(A, B, "difference")
            if diff is not None:
                gotd = sum(abs(G._ring_signed_area(p)) for p in diff)
                assert gotd == pytest.approx(
                    poly_area(A) - exp_i, rel=1e-6, abs=1e-9)
                checked_d += 1
        assert checked_i > 60 and checked_d > 60


class TestCheckCoverage:
    """gdal vector check-coverage overlap detection (round 5)."""

    def test_overlaps_flagged_edges_ignored(self, spark):
        import pandas as pd

        from gdal_spark.operators.layer_algebra import check_coverage
        from gdal_spark.oracle import geom as G

        sq = lambda x0, y0, x1, y1: G.to_wkb(
            "polygon", [[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]])
        df = spark.createDataFrame(pd.DataFrame({
            "fid": [1, 2, 3, 4],
            "wkb": [
                sq(0, 0, 2, 2),      # 1 and 2 share only an edge: valid
                sq(2, 0, 4, 2),
                sq(3, 0, 5, 2),      # 3 overlaps 2 by a 1x2 slab
                sq(10, 10, 11, 11),  # disjoint
            ]}))
        got = check_coverage(df).toPandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["fid_a"], r["fid_b"]) == (2, 3)
        assert abs(r["area"] - 2.0) < 1e-9

    def test_gap_half_tile_invariant(self, spark):
        """check-coverage maximum-gap-width (GEOSCoverageIsValid gapWidth):
        the 25-square fixture with parity-isolated slivers.  The same gaps
        must come back whether the analysis runs as one window or as 16-px
        tiles with cross-tile component stitching."""
        import pandas as pd

        from gdal_spark.operators.layer_algebra import check_coverage_gaps
        from gdal_spark.oracle import geom as G

        sq = lambda x0, y0, x1, y1: G.to_wkb(
            "polygon", [[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]])
        shrink = {(1, 2): 3, (2, 1): 1, (2, 3): 1, (3, 2): 7}
        rows = []
        for r in range(5):
            for c in range(5):
                x1 = 8.0 * c + 8.0 - shrink.get((r, c), 0)
                rows.append((r * 5 + c + 1,
                             sq(8.0 * c, 32.0 - 8.0 * r, x1, 40.0 - 8.0 * r)))
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["fid", "wkb"]))
        expected = [  # (npix, width, cx, cy); k=7 sliver rejected (width 8)
            (24, 4.0, 22.5, 28.0),
            (8, 2.0, 15.5, 20.0),
            (8, 2.0, 31.5, 20.0),
        ]
        for tile_px in (64, 16):
            got = (check_coverage_gaps(df, 0.0, 40.0, 1.0, 40, 40,
                                       max_gap_width=5.0, tile_px=tile_px)
                   .toPandas().sort_values("gap_id").reset_index(drop=True))
            assert [(int(r.npix), r.width, r.cx, r.cy)
                    for r in got.itertuples()] == expected

    def test_gap_half_outside_and_wide_excluded(self, spark):
        """With a margin around the coverage, the outside region touches the
        extent border and is never a gap; raising max_gap_width admits the
        wide k=7 sliver too."""
        import pandas as pd

        from gdal_spark.operators.layer_algebra import check_coverage_gaps
        from gdal_spark.oracle import geom as G

        sq = lambda x0, y0, x1, y1: G.to_wkb(
            "polygon", [[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]])
        shrink = {(1, 2): 3, (2, 1): 1, (2, 3): 1, (3, 2): 7}
        rows = []
        for r in range(5):
            for c in range(5):
                x1 = 8.0 * c + 8.0 - shrink.get((r, c), 0)
                rows.append((r * 5 + c + 1,
                             sq(8.0 * c, 32.0 - 8.0 * r, x1, 40.0 - 8.0 * r)))
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["fid", "wkb"]))
        # extent = coverage bbox + 4-cell margin on every side
        got = (check_coverage_gaps(df, -4.0, 44.0, 1.0, 48, 48,
                                   max_gap_width=5.0, tile_px=16)
               .toPandas())
        assert sorted(got["npix"]) == [8, 8, 24]      # outside not reported
        wide = (check_coverage_gaps(df, -4.0, 44.0, 1.0, 48, 48,
                                    max_gap_width=9.0, tile_px=16)
                .toPandas())
        assert sorted(wide["npix"]) == [8, 8, 24, 56]  # k=7: 7x8 admitted
        assert sorted(wide["width"])[-1] == 8.0


class TestSimplifyCoverage:
    """gdal vector simplify-coverage -> GEOSCoverageSimplifyVW (round 5):
    shared-arc Visvalingam-Whyatt with pinned coverage nodes."""

    @staticmethod
    def _zigzag_grid(spark):
        import pandas as pd

        from gdal_spark.oracle import geom as G

        def zig(x, ylo, dx, up):
            pts = [(x + (dx if i % 2 == 1 else 0.0), ylo + i)
                   for i in range(1, 8)]
            return pts if up else pts[::-1]

        rows = []
        for r in range(3):
            for c in range(3):
                x0, x1 = 8.0 * c, 8.0 * c + 8.0
                y1, y0 = 24.0 - 8.0 * r, 16.0 - 8.0 * r
                ring = [(x0, y0), (x1, y0)]
                if c < 2:
                    ring += zig(x1, y0, 0.4, True)
                ring += [(x1, y1), (x0, y1)]
                if c > 0:
                    ring += zig(x0, y0, 0.4, False)
                elif r == 0:
                    ring += zig(x0, y0, -0.4, False)
                ring.append((x0, y0))
                rows.append((r * 3 + c + 1, G.to_wkb("polygon", [ring])))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["fid", "wkb"]),
            "fid long, wkb binary")

    def test_shared_arcs_straighten_boundary_preserved(self, spark):
        from gdal_spark.operators.layer_algebra import (check_coverage,
                                                        simplify_coverage)
        from gdal_spark.oracle import geom as G

        df = self._zigzag_grid(spark)
        out = simplify_coverage(df, tolerance=1.5, preserve_boundary=True)
        pdf = out.toPandas().sort_values("fid")
        for t in pdf.itertuples(index=False):
            _, d = G.parse_wkb(bytes(t.wkb))
            n, area = len(d[0]), abs(G._ring_signed_area(d[0]))
            if t.fid == 1:  # outer zigzag preserved: 4 teeth = +1.6
                assert n == 12 and abs(area - 65.6) < 1e-9
            else:           # interior zigzags straighten exactly
                assert n == 5 and abs(area - 64.0) < 1e-9
        # simplification must not break the coverage: no overlaps
        assert check_coverage(out).count() == 0

    def test_no_preserve_flattens_exterior(self, spark):
        from gdal_spark.operators.layer_algebra import simplify_coverage
        from gdal_spark.oracle import geom as G

        df = self._zigzag_grid(spark)
        pdf = (simplify_coverage(df, tolerance=1.5,
                                 preserve_boundary=False)
               .toPandas().sort_values("fid"))
        for t in pdf.itertuples(index=False):
            _, d = G.parse_wkb(bytes(t.wkb))
            assert len(d[0]) == 5
            assert abs(abs(G._ring_signed_area(d[0])) - 64.0) < 1e-9

    def test_tolerance_zero_identity(self, spark):
        from gdal_spark.operators.layer_algebra import simplify_coverage
        from gdal_spark.oracle import geom as G

        df = self._zigzag_grid(spark)
        pdf = simplify_coverage(df, tolerance=0.0).toPandas()
        orig = {r["fid"]: bytes(r["wkb"])
                for _, r in df.toPandas().iterrows()}
        for t in pdf.itertuples(index=False):
            _, d0 = G.parse_wkb(orig[t.fid])
            _, d1 = G.parse_wkb(bytes(t.wkb))
            # same vertex multiset per ring (rotation may differ for a
            # ring with no junction; here every ring has junctions, so
            # sequences must match up to start rotation)
            assert len(d0[0]) == len(d1[0])
            s0 = sorted(map(tuple, d0[0][:-1]))
            s1 = sorted(map(tuple, d1[0][:-1]))
            assert s0 == s1

    def test_island_in_hole_shared_closed_ring(self, spark):
        """A hole ring shared vertex-for-vertex with an island's outer
        ring is ONE closed arc with no junctions: both owners must get
        the identical simplified ring (rotation-canonical anchor)."""
        import pandas as pd

        from gdal_spark.operators.layer_algebra import simplify_coverage
        from gdal_spark.oracle import geom as G

        def zig(x, ylo, dx, up):
            pts = [(x + (dx if i % 2 == 1 else 0.0), ylo + i)
                   for i in range(1, 8)]
            return pts if up else pts[::-1]

        hole = [(8.0, 8.0), (16.0, 8.0)] + zig(16.0, 8.0, 0.4, True) \
            + [(16.0, 16.0), (8.0, 16.0)] + [(8.0, 8.0)]
        outer = [(0.0, 0.0), (24.0, 0.0), (24.0, 24.0), (0.0, 24.0),
                 (0.0, 0.0)]
        a = G.to_wkb("polygon", [outer, hole])
        b = G.to_wkb("polygon", [hole])
        df = spark.createDataFrame(
            pd.DataFrame({"fid": [1, 2], "wkb": [a, b]}),
            "fid long, wkb binary")
        pdf = (simplify_coverage(df, tolerance=1.5)
               .toPandas().sort_values("fid"))
        _, da = G.parse_wkb(bytes(pdf.iloc[0]["wkb"]))
        _, db = G.parse_wkb(bytes(pdf.iloc[1]["wkb"]))
        ra = sorted(map(tuple, da[1][:-1]))   # A's hole ring
        rb = sorted(map(tuple, db[0][:-1]))   # B's outer ring
        assert ra == rb == [(8.0, 8.0), (8.0, 16.0),
                            (16.0, 8.0), (16.0, 16.0)]
        assert abs(abs(G._ring_signed_area(db[0])) - 64.0) < 1e-9


class TestCleanCoverage:
    """gdal vector clean-coverage overlap merge (round 5):
    GEOSCoverageCleanParams merge strategies."""

    @staticmethod
    def _sq(x0, y0, x1, y1):
        from gdal_spark.oracle import geom as G
        return G.to_wkb("polygon",
                        [[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]])

    @staticmethod
    def _areas(pdf):
        import numpy as np

        from gdal_spark.oracle import geom as G
        out = {}
        for t in pdf.itertuples(index=False):
            kind, d = G.parse_wkb(bytes(t.wkb))
            parts = [d] if kind == "polygon" else d
            out[t.fid] = round(sum(
                abs(G._ring_signed_area(np.asarray(p[0]))) for p in parts), 9)
        return out

    def test_strategies(self, spark):
        import pandas as pd

        from gdal_spark.operators.layer_algebra import (check_coverage,
                                                        clean_coverage)

        # A tall 4x10 and B wide 10x4 overlapping by 2x4: the piece
        # borders A's remainder along 8 units (B's edges inside A) and
        # B's remainder along 4 (A's right edge) -> longest-border: A
        # keeps. Both areas are 40 -> max/min-area tie to lower fid.
        df = spark.createDataFrame(pd.DataFrame({
            "fid": [1, 2],
            "wkb": [self._sq(0, 0, 4, 10), self._sq(2, 3, 12, 7)],
        }), "fid long, wkb binary")
        for strat in ("longest-border", "min-index", "max-area",
                      "min-area"):
            out = clean_coverage(df, merge_strategy=strat).toPandas()
            assert self._areas(out) == {1: 40.0, 2: 32.0}, strat
            odf = spark.createDataFrame(out, "fid long, wkb binary")
            assert check_coverage(odf).count() == 0

    def test_asymmetric_area_strategies(self, spark):
        import pandas as pd

        from gdal_spark.operators.layer_algebra import clean_coverage

        # A 10x10 (area 100) and C 11x6 (area 66) overlapping by 1x6.
        df = spark.createDataFrame(pd.DataFrame({
            "fid": [1, 2],
            "wkb": [self._sq(0, 0, 10, 10), self._sq(9, 2, 20, 8)],
        }), "fid long, wkb binary")
        for strat, expect in (("longest-border", {1: 100.0, 2: 60.0}),
                              ("max-area", {1: 100.0, 2: 60.0}),
                              ("min-area", {1: 94.0, 2: 66.0})):
            got = self._areas(
                clean_coverage(df, merge_strategy=strat).toPandas())
            assert got == expect, (strat, got)

    def test_non_overlapping_untouched(self, spark):
        import pandas as pd

        from gdal_spark.operators.layer_algebra import clean_coverage

        df = spark.createDataFrame(pd.DataFrame({
            "fid": [1, 2, 3],
            "wkb": [self._sq(0, 0, 4, 4), self._sq(4, 0, 8, 4),
                    self._sq(20, 20, 24, 24)],
        }), "fid long, wkb binary")
        out = clean_coverage(df).toPandas()
        assert self._areas(out) == {1: 16.0, 2: 16.0, 3: 16.0}
        # byte-identical geometry for untouched features
        orig = {r["fid"]: bytes(r["wkb"]) for _, r in df.toPandas().iterrows()}
        for t in out.itertuples(index=False):
            assert bytes(t.wkb) == orig[t.fid]


class TestCoverageGapClose:
    """clean-coverage gap closing + node snapping (round 5)."""

    @staticmethod
    def _dense_rect(x0, y0, x1, y1, jitter=None):
        import numpy as np

        from gdal_spark.oracle import geom as G
        pts = []
        xs = list(np.arange(x0, x1)) + [x1]
        ys = list(np.arange(y0, y1)) + [y1]
        for x in xs[:-1]:
            pts.append((float(x), float(y0)))
        for y in ys[:-1]:
            pts.append((float(x1), float(y)))
        for x in xs[:0:-1]:
            pts.append((float(x), float(y1)))
        for y in ys[:0:-1]:
            pts.append((float(x0), float(y)))
        pts.append(pts[0])
        if jitter:
            jx, jy, dx, dy = jitter
            pts = [(px + dx, py + dy) if (px, py) == (jx, jy) else (px, py)
                   for px, py in pts]
        return G.to_wkb("polygon", [pts])

    def _grid(self, spark, jitter=False):
        import pandas as pd
        rows = []
        for r in range(3):
            for c in range(3):
                x0, x1 = 8 * c, 8 * c + 8
                y1, y0 = 24 - 8 * r, 16 - 8 * r
                jit = None
                if (r, c) == (1, 0):
                    x1 -= 1        # 1x8 sliver at x in [7, 8]
                    if jitter:
                        jit = (3.0, 16.0, 0.002, -0.001)
                if (r, c) == (1, 2):
                    x0 += 6        # 6x8 wide gap (width 8 > W)
                rows.append((r * 3 + c + 1,
                             self._dense_rect(x0, y0, x1, y1, jit)))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["fid", "wkb"]),
            "fid long, wkb binary")

    @staticmethod
    def _areas(pdf):
        import numpy as np

        from gdal_spark.oracle import geom as G
        out = {}
        for t in pdf.itertuples(index=False):
            kind, d = G.parse_wkb(bytes(t.wkb))
            parts = [d] if kind == "polygon" else d
            out[t.fid] = round(sum(
                abs(G._ring_signed_area(np.asarray(p[0]))) for p in parts), 6)
        return out

    def test_narrow_gap_closes_wide_stays(self, spark):
        from gdal_spark.operators.layer_algebra import (check_coverage,
                                                        check_coverage_gaps,
                                                        close_coverage_gaps)

        df = self._grid(spark)
        out = close_coverage_gaps(df, max_gap_width=3.0).toPandas()
        areas = self._areas(out)
        # the 1x8 sliver merges into the longest-border neighbour (tie
        # between the two 8-unit side arcs resolves to fid 5's arc key);
        # the 6x8 gap (inscribed width 8) is untouched
        assert areas == {1: 64.0, 2: 64.0, 3: 64.0, 4: 56.0, 5: 72.0,
                         6: 16.0, 7: 64.0, 8: 64.0, 9: 64.0}
        odf = spark.createDataFrame(out[["fid", "wkb"]],
                                    "fid long, wkb binary")
        assert check_coverage_gaps(odf, -1.0, 25.0, 1.0, 26, 26,
                                   max_gap_width=3.0).count() == 0
        assert check_coverage(odf).count() == 0

    def test_snap_restores_noded_coverage(self, spark):
        import numpy as np

        from gdal_spark.oracle import geom as G
        from gdal_spark.operators.layer_algebra import (close_coverage_gaps,
                                                        snap_coverage)

        df = self._grid(spark, jitter=True)
        snapped = snap_coverage(df, 0.03125)  # 2^-5: integers snap exact
        out = close_coverage_gaps(snapped, max_gap_width=3.0).toPandas()
        assert self._areas(out)[5] == 72.0    # gap still detected+closed
        _, d = G.parse_wkb(bytes(out[out.fid == 4]["wkb"].iloc[0]))
        arr = np.asarray(d[0])
        assert np.all(arr == np.round(arr))   # jitter fully removed

    def test_narrow_hole_dropped(self, spark):
        """A junction-free narrow hole is a single-closed-arc gap loop:
        closing it deletes the ring from its owner."""
        import pandas as pd

        from gdal_spark.oracle import geom as G
        from gdal_spark.operators.layer_algebra import close_coverage_gaps

        outer = [(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0),
                 (0.0, 0.0)]
        hole = [(5.0, 5.0), (5.0, 15.0), (6.0, 15.0), (6.0, 5.0),
                (5.0, 5.0)]  # 1x10 slit, inscribed width 1
        wide_hole = [(10.0, 5.0), (10.0, 15.0), (18.0, 15.0),
                     (18.0, 5.0), (10.0, 5.0)]  # 8x10, width 8
        df = spark.createDataFrame(pd.DataFrame({
            "fid": [1],
            "wkb": [G.to_wkb("polygon", [outer, hole, wide_hole])],
        }), "fid long, wkb binary")
        import numpy as np

        out = close_coverage_gaps(df, max_gap_width=3.0).toPandas()
        _, d = G.parse_wkb(bytes(out["wkb"].iloc[0]))
        assert len(d) == 2  # outer + the wide hole only; slit ring gone
        net = (abs(G._ring_signed_area(np.asarray(d[0])))
               - abs(G._ring_signed_area(np.asarray(d[1]))))
        assert net == 400.0 - 80.0
