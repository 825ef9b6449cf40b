"""Geometry measures vs a naive per-geometry scalar reference."""

import math

import numpy as np
import pyarrow as pa
import pytest

from rayjoin.fixtures import mixed_random
from rayjoin.geom import spec
from rayjoin.geom.encode import geoms_to_table
from rayjoin.geom.measures import measures_batch


def _ring_shoelace(pts):
    """(signed_cross_sum, perimeter, nx, ny) over a CLOSED vertex list."""
    s = per = nx = ny = 0.0
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        c = x0 * y1 - x1 * y0
        s += c
        per += math.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)
        nx += (x0 + x1) * c
        ny += (y0 + y1) * c
    return s, per, nx, ny


def _closed(pts):
    return list(pts) + ([pts[0]] if pts[0] != pts[-1] else [])


def _naive(g):
    k = g.kind
    if k == spec.POINT:
        return 0.0, 0.0, g.x, g.y
    if k == spec.LINE:
        ln = math.sqrt((g.ex - g.sx) ** 2 + (g.ey - g.sy) ** 2)
        if ln == 0.0:
            return 0.0, 0.0, (g.sx + g.ex) / 2, (g.sy + g.ey) / 2
        return 0.0, ln, (g.sx + g.ex) * 0.5, (g.sy + g.ey) * 0.5
    if k == spec.LINESTRING:
        pts = [(p[0], p[1]) for p in g.pts]
        tot = mx = my = 0.0
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            ln = math.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)
            tot += ln
            mx += ln * (x0 + x1) * 0.5
            my += ln * (y0 + y1) * 0.5
        if tot == 0.0:
            return 0.0, 0.0, sum(p[0] for p in pts) / len(pts), sum(p[1] for p in pts) / len(pts)
        return 0.0, tot, mx / tot, my / tot
    if k == spec.RECT:
        pts = _closed([(g.xmin, g.ymin), (g.xmin, g.ymax), (g.xmax, g.ymax),
                       (g.xmax, g.ymin)])
    elif k == spec.TRIANGLE:
        pts = _closed([(g.ax, g.ay), (g.bx, g.by), (g.cx, g.cy)])
    else:  # polygon with optional holes
        rings = [g.exterior] + list(g.interiors)
        area = per = 0.0
        num_x = num_y = den = 0.0
        for ri, ring in enumerate(rings):
            pts = _closed([(p[0], p[1]) for p in ring])
            s, p, nx, ny = _ring_shoelace(pts)
            a = abs(s) * 0.5
            sgn = 1.0 if ri == 0 else -1.0
            area += sgn * a
            per += p
            if s != 0.0:
                den += sgn * a
                num_x += sgn * a * (nx / (3.0 * s))
                num_y += sgn * a * (ny / (3.0 * s))
        if len(rings) == 1:
            s, p, nx, ny = _ring_shoelace(_closed([(q[0], q[1]) for q in rings[0]]))
            if s != 0.0:
                return area, per, nx / (3.0 * s), ny / (3.0 * s)
            vs = rings[0]
            return area, per, sum(q[0] for q in vs) / len(vs), sum(q[1] for q in vs) / len(vs)
        if den != 0.0:
            return area, per, num_x / den, num_y / den
        vs = [q for ring in rings for q in ring]
        return area, per, sum(q[0] for q in vs) / len(vs), sum(q[1] for q in vs) / len(vs)
    s, p, nx, ny = _ring_shoelace(pts)
    if s == 0.0:
        core = pts[:-1]
        return 0.0, p, sum(q[0] for q in core) / len(core), sum(q[1] for q in core) / len(core)
    return abs(s) * 0.5, p, nx / (3.0 * s), ny / (3.0 * s)


def test_measures_vs_naive_all_kinds():
    geoms = mixed_random(300, seed=13)
    got = measures_batch(geoms_to_table(geoms)).to_pandas()
    for i, g in enumerate(geoms):
        area, ln, cx, cy = _naive(g)
        row = got.iloc[i]
        assert row["area"] == pytest.approx(area, rel=1e-12, abs=1e-15), (i, g)
        assert row["length"] == pytest.approx(ln, rel=1e-12, abs=1e-15), (i, g)
        assert row["centroid_x"] == pytest.approx(cx, rel=1e-9, abs=1e-12), (i, g)
        assert row["centroid_y"] == pytest.approx(cy, rel=1e-9, abs=1e-12), (i, g)


def test_measures_polygon_with_hole():
    # 10x10 square with a 2x2 hole offset from center: exact closed forms
    outer = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    hole = [(6.0, 6.0), (8.0, 6.0), (8.0, 8.0), (6.0, 8.0)]
    g = spec.Polygon.new(outer, [hole])
    out = measures_batch(geoms_to_table([g])).to_pandas().iloc[0]
    assert out["area"] == pytest.approx(100.0 - 4.0)
    assert out["length"] == pytest.approx(40.0 + 8.0)
    # centroid: (100*(5,5) - 4*(7,7)) / 96
    assert out["centroid_x"] == pytest.approx((100 * 5.0 - 4 * 7.0) / 96)
    assert out["centroid_y"] == pytest.approx((100 * 5.0 - 4 * 7.0) / 96)


def test_measures_degenerate():
    # collapsed triangle: zero area, centroid = vertex mean
    g = spec.Triangle(0.0, 0.0, 2.0, 2.0, 4.0, 4.0)
    out = measures_batch(geoms_to_table([g])).to_pandas().iloc[0]
    assert out["area"] == 0.0
    assert out["centroid_x"] == pytest.approx(2.0)
    # zero-length line
    g2 = spec.Line(3.0, 4.0, 3.0, 4.0)
    out2 = measures_batch(geoms_to_table([g2])).to_pandas().iloc[0]
    assert out2["length"] == 0.0 and out2["centroid_x"] == 3.0
