"""Deterministic test fixtures (FIXTURES.md).

Ports of the reference's test inputs:
- the 4 hand-written unit cases (/root/reference/src/lib.rs:464-527 + doc
  examples :95-156),
- the proptest generators over [-1,1]^2 (/root/reference/src/proptests.rs:15-87),
- the pill-box bench generator (/root/reference/benches/spatial_join.rs:37-59;
  GEOS buffer() replaced by an in-repo 16-segment-per-quadrant capsule since
  this sandbox has no GEOS),
- the proptest regression corpus (/root/reference/proptest-regressions/*.txt)
  as literal rows.

All generation is seeded (numpy default_rng) — no external data.
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from .geom.spec import Line, LineString, Point, Polygon, Rect, Triangle


# --- unit cases (lib.rs) ---------------------------------------------------


def unit_cases():
    """The reference's hand-written cases: (name, small, big, config kwargs, kind)."""
    return [
        # lib.rs:95-110 doc example — point self-join
        ("doc_point_self", [Point(1.1, 2.2)], [Point(1.1, 2.2)], {}, "sjoin_intersects"),
        # lib.rs:115-147 doc example — rect contains smaller rect
        (
            "doc_rect_contains",
            [Rect(-1.0, -1.0, 1.0, 1.0)],
            [Rect(-0.5, -0.5, 0.5, 0.5)],
            {},
            "sjoin_contains",
        ),
        # lib.rs:464-477 simple_index_self
        ("prox_self", [Point(1.0, 1.0)], [Point(1.0, 1.0)], {"max_distance": 4.0}, "prox"),
        # lib.rs:479-499 self_spatial_join_pair
        (
            "sjoin_pair",
            [Point(1.0, 1.0), Point(22.0, 22.0)],
            [Point(1.0, 1.0), Point(22.0, 22.0)],
            {},
            "sjoin_intersects",
        ),
        # lib.rs:501-514 simple_index_some_other
        ("prox_hit", [Point(1.0, 1.0)], [Point(2.0, 1.0)], {"max_distance": 4.0}, "prox"),
        # lib.rs:516-525 simple_index_none
        ("prox_miss", [Point(1.0, 1.0)], [Point(2.0, 1.0)], {"max_distance": 0.5}, "prox"),
    ]


# --- proptest-style generators (proptests.rs:15-87) ------------------------


def _point(rng) -> Point:
    return Point(rng.uniform(-1, 1), rng.uniform(-1, 1))


def _line(rng) -> Line:
    a, b = _point(rng), _point(rng)
    return Line(a.x, a.y, b.x, b.y)


def _linestring(rng) -> LineString:
    n = rng.integers(2, 20)
    return LineString(tuple((rng.uniform(-1, 1), rng.uniform(-1, 1)) for _ in range(n)))


def _rect(rng) -> Rect:
    c = _point(rng)
    w = rng.uniform(0, 1)
    h = rng.uniform(0, 1)
    return Rect(c.x - w / 2, c.y - h / 2, c.x + w / 2, c.y + h / 2)


def _poly(rng) -> Polygon:
    """Regular n-gon, 3-17 vertices, radius in [1e-6, 0.5) (proptests.rs:50-67)."""
    c = _point(rng)
    n = int(rng.integers(3, 17))
    radius = rng.uniform(0.000001, 0.5)
    pts = []
    for idx in range(n):
        ang = 2.0 * math.pi * idx / n
        pts.append((c.x + radius * math.cos(ang), c.y + radius * math.sin(ang)))
    return Polygon.new(pts)


def _triangle(rng) -> Triangle:
    a, b, c = _point(rng), _point(rng), _point(rng)
    return Triangle(a.x, a.y, b.x, b.y, c.x, c.y)


_GENS = [_point, _line, _linestring, _poly, _rect, _triangle]


def mixed_random(n: int, seed: int) -> List:
    """All 6 types over [-1,1]^2, uniform type choice (proptests.rs:78-87)."""
    rng = np.random.default_rng(seed)
    return [_GENS[rng.integers(0, len(_GENS))](rng) for _ in range(n)]


# --- pill-box generator (benches/spatial_join.rs:37-59) --------------------


def capsule(x0: float, y0: float, x1: float, y1: float, width: float, quadsegs: int = 16) -> Polygon:
    """Buffer a segment into a pill-box polygon: two half-circles (quadsegs
    segments per quarter circle, GEOS convention) joined by straight sides.
    In-repo replacement for GEOS buffer() (no GEOS in sandbox)."""
    dx, dy = x1 - x0, y1 - y0
    L = math.sqrt(dx * dx + dy * dy)
    # trig via numpy ufuncs so this scalar builder is bit-identical to the
    # vectorized pillboxes_table fast path (math.cos and np.cos differ by
    # 1-2 ulp for some arguments)
    if L == 0.0:
        # degenerate: circle around the point
        n = quadsegs * 4
        a = 2.0 * math.pi * np.arange(n) / n
        return Polygon.new(list(zip(x0 + width * np.cos(a), y0 + width * np.sin(a))))
    ux, uy = dx / L, dy / L  # unit along
    theta = float(np.arctan2(uy, ux))
    n = quadsegs * 2  # per half-circle
    i = np.arange(n + 1)
    # half circle around (x1,y1) from theta-pi/2, then around (x0,y0) from theta+pi/2
    a1 = theta - math.pi / 2 + math.pi * i / n
    a2 = theta + math.pi / 2 + math.pi * i / n
    pts = list(zip(x1 + width * np.cos(a1), y1 + width * np.sin(a1)))
    pts += list(zip(x0 + width * np.cos(a2), y0 + width * np.sin(a2)))
    return Polygon.new(pts)


def pillboxes(
    n: int,
    seed: int,
    max_len: float = 40.0,
    buffer_width: float = 5.0,
    width: float = 5000.0,
    height: float = 2000.0,
    quadsegs: int = 16,
) -> List[Polygon]:
    """n random pill-boxes in a width×height plane (bench generator parity)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        x0 = rng.random() * width
        y0 = rng.random() * height
        ang = rng.random() * 2.0 * math.pi
        x1 = x0 + max_len * math.cos(ang)
        y1 = y0 + max_len * math.sin(ang)
        out.append(capsule(x0, y0, x1, y1, buffer_width, quadsegs))
    return out


def pillboxes_table(
    n: int,
    seed: int,
    max_len: float = 40.0,
    buffer_width: float = 5.0,
    width: float = 5000.0,
    height: float = 2000.0,
    quadsegs: int = 16,
):
    """Vectorized twin of ``encode.geoms_to_table(pillboxes(...))`` — same
    RNG stream, same per-vertex arithmetic, bit-identical Arrow output
    (asserted by tests), but numpy-built (no per-geometry Python loop).
    Used by the bench so fixture generation doesn't pollute join timings."""
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    draws = rng.random((n, 3))  # same stream order as the scalar loop
    x0 = draws[:, 0] * width
    y0 = draws[:, 1] * height
    ang = draws[:, 2] * 2.0 * math.pi
    x1 = x0 + max_len * np.cos(ang)
    y1 = y0 + max_len * np.sin(ang)
    dx = x1 - x0
    dy = y1 - y0
    L = np.sqrt(dx * dx + dy * dy)
    ux, uy = dx / L, dy / L
    theta = np.arctan2(uy, ux)
    m = quadsegs * 2
    i = np.arange(m + 1)
    a1 = theta[:, None] - math.pi / 2 + math.pi * i[None, :] / m
    a2 = theta[:, None] + math.pi / 2 + math.pi * i[None, :] / m
    px = np.concatenate(
        [x1[:, None] + buffer_width * np.cos(a1), x0[:, None] + buffer_width * np.cos(a2)],
        axis=1,
    )
    py = np.concatenate(
        [y1[:, None] + buffer_width * np.sin(a1), y0[:, None] + buffer_width * np.sin(a2)],
        axis=1,
    )
    # close the ring (Polygon.new appends the first vertex)
    px = np.concatenate([px, px[:, :1]], axis=1)
    py = np.concatenate([py, py[:, :1]], axis=1)
    nv = px.shape[1]
    flat = np.empty((n, nv, 2), dtype=np.float64)
    flat[:, :, 0] = px
    flat[:, :, 1] = py
    values = pa.array(flat.reshape(-1), pa.float64())
    ring = pa.ListArray.from_arrays(
        pa.array(np.arange(n + 1, dtype=np.int32) * (nv * 2)), values
    )
    coords = pa.ListArray.from_arrays(pa.array(np.arange(n + 1, dtype=np.int32)), ring)
    return pa.table(
        {
            "row_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "geom_type": pa.array(np.full(n, 3, np.int8), pa.int8()),
            "coords": coords,
        }
    )


# --- regression corpus (proptest-regressions/*.txt, literal) ---------------

_SLIVER = Polygon.new(
    [
        (0.000001, 0.0),
        (0.0000007071067811865476, 0.0000007071067811865475),
        (0.00000000000000000000006123233995736766, 0.000001),
        (0.000001, 0.0),
    ]
)


def degenerate_cases():
    """(name, small, big, max_distance) prox-map cases from the regression corpus.
    Cases whose original inputs are invalid (empty/1-pt linestrings) are kept
    for validation-error tests instead (see invalid_cases)."""
    return [
        # lib.txt cc2792d9: point vs zero-length line
        ("zero_len_line", [Point(0.0, 0.0)], [Line(0.0, 0.0, 0.0, 0.0)], 0.0),
        # proptests.txt cc0e3dd60: collapsed polygon vs point
        (
            "collapsed_poly",
            [Polygon.new([(0.0, 0.0), (0.0, 0.0), (0.0, 0.0)])],
            [Point(0.0, 0.0)],
            0.0,
        ),
        # proptests.txt cc845d886 (self-join pile-up at origin)
        (
            "origin_pileup",
            [
                Point(0.0, 0.0),
                Triangle(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
                Point(0.0, 0.0),
                Rect(0.0, 0.0, 0.0, 0.0),
                Rect(0.0, 0.0, 0.0, 0.0),
                Triangle(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
                Rect(0.0, 0.0, 0.0, 0.0),
                Point(0.0, 0.0),
            ],
            None,  # self join
            0.0,
        ),
    ]


def relates_regression_pairs():
    """(a, b) pairs from the libgeos-differential regressions (proptests.txt)."""
    return [
        # ccd5b1578: polygon vs rect
        (
            Polygon.new(
                [
                    (0.2830489625756334, 0.0),
                    (0.2520571956822212, 0.09538285075582777),
                    (0.1709196965838543, 0.1543326944667879),
                    (0.07062823217394498, 0.15433269446678793),
                    (0.2830489625756334, 0.0),
                ]
            ),
            Rect(0.3051777447381212, 0.19669725667687643, 0.4213073259271589, 1.1928087604867796),
        ),
        # cc66bd0ff: line vs polygon
        (
            Line(0.0, 0.0, -0.16371620275753784, 0.6927014516964842),
            Polygon.new(
                [
                    (0.16819167902313092, 0.9630196581794301),
                    (0.15759414274018685, 1.0502982217616563),
                    (0.1264174241796423, 1.132504472473154),
                    (0.07647340090147503, 1.2048608818301343),
                    (0.010664637999474147, 1.2631623583256162),
                    (-0.06718429843161658, 1.304020632062927),
                    (-0.15254911117579234, 1.3250611686862364),
                    (-0.24046870760483086, 1.3250611686862364),
                    (-0.32583352034900664, 1.304020632062927),
                    (-0.4036824567800973, 1.2631623583256164),
                    (-0.46949121968209834, 1.2048608818301343),
                    (-0.5194352429602654, 1.1325044724731543),
                    (0.16819167902313092, 0.9630196581794301),
                ]
            ),
        ),
        # cc881e683: polygon vs line
        (
            Polygon.new(
                [
                    (1.187921045169523, 0.13548520119881102),
                    (0.9859597198710358, 0.4852924777797367),
                    (0.5820370692740611, 0.4852924777797368),
                    (0.3800757439755737, 0.13548520119881108),
                    (0.5820370692740608, -0.21432207538211462),
                    (1.187921045169523, 0.13548520119881102),
                ]
            ),
            Line(-0.33977562454670807, 0.0, 0.49486139442294563, 0.438739662450339),
        ),
        # cc10ebad8: rect vs polygon
        (
            Rect(-0.17084137691985102, 0.09858870312437906, 0.45257457282855895, 0.8748085493016657),
            Polygon.new(
                [
                    (-0.10781391405721802, -0.15433610862574643),
                    (-0.7855276236615211, 0.23694208404779793),
                    (-0.7855276236615214, -0.5456143012992907),
                    (-0.10781391405721802, -0.15433610862574643),
                ]
            ),
        ),
        # sliver polygon (valid side of cc-ade77/cc-c0985)
        (_SLIVER, Point(0.0, 0.0)),
    ]


def invalid_cases():
    """Geometries that must raise validation errors (structs.rs:9-22)."""
    return [
        ("empty_linestring", LineString(()), "LineStringTooSmall"),
        ("one_point_linestring", LineString(((0.0, 0.0),)), "LineStringTooSmall"),
        ("tiny_polygon_exterior", Polygon(((0.0, 0.0),), ()), "PolygonExteriorTooSmall"),
        ("nan_point", Point(float("nan"), 0.0), "BadCoordinateValue"),
        ("inf_line", Line(0.0, 0.0, float("inf"), 0.0), "BadCoordinateValue"),
    ]
