"""Unit tests for the scalar Relates spec + the naive oracle.

Mirrors the reference's hand-written unit layer
(/root/reference/src/lib.rs:267-527) and pins a set of hand-computed
kernel facts including the geo v0.14 boundary quirks (SURVEY.md §2.5).
"""

import math

import pytest

from rayjoin.config import Interaction
from rayjoin.fixtures import (
    degenerate_cases,
    mixed_random,
    pillboxes,
    relates_regression_pairs,
    unit_cases,
    invalid_cases,
)
from rayjoin.geom import encode, spec
from rayjoin.geom.spec import Line, LineString, Point, Polygon, Rect, Triangle
from rayjoin.oracle import slow_prox_map, slow_spatial_join


# --- the reference's unit cases, answered by the oracle --------------------


def test_unit_cases_oracle():
    expected = {
        "doc_point_self": [(0, 0)],
        "doc_rect_contains": [(0, 0)],  # Interaction::Contains (small contains big? see below)
        "prox_self": [(0, 0, 0.0)],
        "sjoin_pair": [(0, 0), (1, 1)],
        "prox_hit": [(0, 0, 1.0)],
        "prox_miss": [],
    }
    for name, small, big, cfg, kind in unit_cases():
        if kind == "prox":
            rows = slow_prox_map(small, big, cfg.get("max_distance", 0.0))
        elif kind == "sjoin_intersects":
            rows = [tuple(r) for r in slow_spatial_join(small, big, Interaction.INTERSECTS)]
        elif kind == "sjoin_contains":
            # doc example: small=big box, big=smaller box, Interaction::Contains
            # -> emit iff small.Contains(big)  (index.rs:497-534)
            rows = [tuple(r) for r in slow_spatial_join(small, big, Interaction.CONTAINS)]
        assert rows == expected[name], name


# --- hand-computed kernel facts -------------------------------------------


def test_point_point():
    assert spec.intersects(Point(1.0, 2.0), Point(1.0, 2.0))
    assert not spec.intersects(Point(1.0, 2.0), Point(1.0, 2.0000000001))
    assert spec.contains(Point(1.0, 2.0), Point(1.0, 2.0))
    assert spec.distance(Point(0.0, 0.0), Point(3.0, 4.0)) == 5.0


def test_polygon_point_boundary_quirk():
    # geo v0.14: Polygon contains/Intersects Point is interior-only
    sq = Polygon.new([(0, 0), (4, 0), (4, 4), (0, 4)])
    assert spec.contains(sq, Point(2, 2))
    assert not spec.contains(sq, Point(0, 2))  # on boundary (vertical edge)
    assert not spec.intersects(sq, Point(0, 2))  # the quirk: boundary doesn't intersect
    assert not spec.contains(sq, Point(5, 2))
    # point in a hole
    holed = Polygon.new([(0, 0), (4, 0), (4, 4), (0, 4)], [[(1, 1), (3, 1), (3, 3), (1, 3)]])
    assert not spec.contains(holed, Point(2, 2))
    assert spec.contains(holed, Point(0.5, 0.5))
    assert spec.distance(holed, Point(2, 2)) == 1.0  # to the hole ring


def test_rect_semantics():
    r = Rect(0, 0, 2, 2)
    assert spec.contains(r, Point(0, 1))  # inclusive (geo v0.14 Rect)
    assert spec.intersects(r, Point(2, 2))
    assert spec.contains(r, Rect(0.5, 0.5, 1.5, 1.5))
    assert spec.contains(r, r)
    assert spec.intersects(r, Rect(2, 2, 3, 3))  # touching corner counts
    assert not spec.intersects(r, Rect(2.1, 0, 3, 1))
    assert spec.distance(r, Point(3, 0)) == 1.0
    assert spec.distance(r, Rect(3, 0, 4, 1)) == 1.0
    d = spec.distance(r, Point(3, 3))
    assert abs(d - math.sqrt(2.0)) < 1e-15


def test_triangle_semantics():
    t = Triangle(0, 0, 4, 0, 0, 4)
    assert spec.contains(t, Point(1, 1))
    assert not spec.contains(t, Point(5, 5))
    # collapsed triangle: contains only the coincident point (gen.py:87)
    tc = Triangle(1, 1, 1, 1, 1, 1)
    assert spec.contains(tc, Point(1, 1))
    assert not spec.contains(tc, Point(1.5, 1))
    # degenerate collinear triangle quirk: sign test says collinear points "contained"
    tl = Triangle(0, 0, 1, 1, 2, 2)
    assert spec.contains(tl, Point(5, 5))
    # triangle-polygon quirk (relates_impl.rs:359-367): a triangle strictly
    # inside a hole-free polygon does NOT "intersect" it...
    big_poly = Polygon.new([(-10, -10), (10, -10), (10, 10), (-10, 10)])
    assert not spec.intersects(t, big_poly)
    # ...but any triangle "intersects" any polygon with holes
    holed = Polygon.new(
        [(100, 100), (101, 100), (101, 101), (100, 101)], [[(100.2, 100.2), (100.8, 100.2), (100.5, 100.8)]]
    )
    assert spec.intersects(t, holed)
    assert spec.intersects(big_poly, t) == spec.intersects(t, big_poly)  # swapped


def test_line_semantics():
    l = Line(0, 0, 4, 0)
    assert spec.intersects(l, Point(2, 0))
    assert spec.contains(l, Line(1, 0, 3, 0))
    assert spec.intersects(l, Line(2, -1, 2, 1))
    assert not spec.intersects(l, Line(0, 1, 4, 1))  # parallel, offset
    assert spec.intersects(l, Line(5, 0, 6, 0)) is False  # collinear, disjoint
    assert spec.intersects(l, Line(3, 0, 6, 0))  # collinear, overlapping
    assert spec.distance(l, Line(0, 1, 4, 1)) == 1.0
    # zero-length line vs coincident point (regression lib.txt cc2792d9)
    assert spec.distance(Point(0, 0), Line(0, 0, 0, 0)) == 0.0


def test_linestring_weird_contains():
    # geo v0.14 line_string_contains_point: vertex or axis-aligned interior only
    ls = LineString(((0, 0), (2, 2), (4, 2)))
    assert spec.intersects(ls, Point(2, 2))  # vertex
    assert spec.intersects(ls, Point(3, 2))  # interior of horizontal segment
    assert not spec.intersects(ls, Point(1, 1))  # interior of diagonal: MISSED (quirk)
    # but a Line probe does see the diagonal
    assert spec.intersects(Line(1, 1, 1, 1), ls) or spec.intersects(ls, Line(1, 1, 1, 1))


def test_linestring_contains_spanning_line():
    # line spanning two collinear segments
    ls = LineString(((0, 0), (2, 0), (4, 0), (4, 4)))
    assert spec.contains(ls, Line(1, 0, 3, 0))
    assert not spec.contains(ls, Line(3, 0, 4, 1))


def test_polygon_polygon():
    a = Polygon.new([(0, 0), (4, 0), (4, 4), (0, 4)])
    b = Polygon.new([(1, 1), (2, 1), (2, 2), (1, 2)])
    c = Polygon.new([(10, 10), (12, 10), (12, 12), (10, 12)])
    assert spec.contains(a, b)
    assert spec.intersects(a, b)
    assert not spec.contains(b, a)
    assert not spec.intersects(a, c)
    assert spec.distance(a, c) == math.sqrt(72.0)
    assert spec.distance(a, b) == 0.0


def test_prox_inclusive_threshold():
    # include iff distance <= max_distance (inclusive, index.rs:438)
    rows = slow_prox_map([Point(0, 0)], [Point(3, 4)], 5.0)
    assert rows == [(0, 0, 5.0)]
    rows = slow_prox_map([Point(0, 0)], [Point(3, 4)], 4.999999)
    assert rows == []


def test_degenerate_cases_run():
    for name, small, big, maxd in degenerate_cases():
        if big is None:
            big = small
        rows = slow_prox_map(small, big, maxd)
        if name == "zero_len_line":
            assert rows == [(0, 0, 0.0)]
        if name == "origin_pileup":
            # every pair is at distance 0 (all geometries collapsed at origin)
            assert len(rows) == len(small) * len(big)


def test_relates_regressions_stable():
    # the libgeos-differential regression pairs: pin current behavior
    got = []
    for a, b in relates_regression_pairs():
        got.append((spec.intersects(a, b), spec.contains(a, b)))
    # all five pairs are disjoint (the line in case 3 stops just short of the
    # pentagon's left edge); matches GEOS per the reference's differential test
    assert got == [(False, False), (False, False), (False, False), (False, False), (False, False)]


def test_validation_errors():
    from rayjoin import config as C

    errmap = {
        "LineStringTooSmall": C.LineStringTooSmall,
        "PolygonExteriorTooSmall": C.PolygonExteriorTooSmall,
        "BadCoordinateValue": C.BadCoordinateValue,
    }
    for name, g, errname in invalid_cases():
        with pytest.raises(errmap[errname]):
            spec.validate(g, 0)
    with pytest.raises(C.BadMaxDistance):
        from rayjoin.config import Config

        Config(max_distance=-1.0)


def test_encode_roundtrip():
    geoms = mixed_random(50, seed=7) + pillboxes(3, seed=8)
    t = encode.geoms_to_table(geoms)
    back = encode.table_to_geoms(t)
    assert len(back) == len(geoms)
    for (rid, g2), g1 in zip(back, geoms):
        assert g1.kind == g2.kind
        assert spec.envelope(g1) == pytest.approx(spec.envelope(g2))
        # identical relates behavior after round-trip vs a probe point
        p = Point(0.1, 0.2)
        assert spec.distance(g1, p) == spec.distance(g2, p)


def test_envelope():
    assert spec.envelope(Point(1, 2)) == (1, 2, 1, 2)
    assert spec.envelope(Line(3, 1, 0, 2)) == (0, 1, 3, 2)
    assert spec.envelope(Triangle(0, 0, 2, -1, 1, 3)) == (0, -1, 2, 3)
    pb = pillboxes(1, seed=1)[0]
    x0, y0, x1, y1 = spec.envelope(pb)
    assert x1 - x0 <= 40 + 10 + 1e-9 and y1 - y0 <= 40 + 10 + 1e-9


def test_pillboxes_table_fast_path_bit_identical():
    from rayjoin.fixtures import pillboxes_table
    from rayjoin.geom import encode

    fast = pillboxes_table(300, seed=42).cast(encode.GEOM_SCHEMA)
    slow = encode.geoms_to_table(pillboxes(300, seed=42)).cast(encode.GEOM_SCHEMA)
    assert fast.equals(slow)
