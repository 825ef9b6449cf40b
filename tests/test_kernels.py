"""Vectorized kernels ≡ scalar spec, bit-for-bit.

The analog of the reference's proptest differential layer
(/root/reference/src/proptests.rs:109-144): every (method, type-pair) bucket
is exercised via seeded cross products of the proptest-style generators plus
the degenerate corpus, and the vectorized result must equal the scalar spec
exactly (booleans identical; distances bit-identical).
"""

import numpy as np
import pytest

from rayjoin.fixtures import degenerate_cases, mixed_random, pillboxes
from rayjoin.geom import encode, spec
from rayjoin.geom.batch import GeomBatch
from rayjoin.geom.relates import relate, to_spec
from rayjoin.geom.spec import Line, LineString, Point, Polygon, Rect, Triangle


def _batch(geoms):
    return GeomBatch.from_arrow(encode.geoms_to_table(geoms))


def _cross_check(small, big, methods=("intersects", "contains", "distance")):
    A = _batch(small)
    B = _batch(big)
    na, nb = len(small), len(big)
    ia, ib = np.meshgrid(np.arange(na), np.arange(nb), indexing="ij")
    ia, ib = ia.ravel(), ib.ravel()
    for method in methods:
        got = relate(method, A, ia, B, ib)
        fn = {"intersects": spec.intersects, "contains": spec.contains, "distance": spec.distance}[
            method
        ]
        exp = np.array([fn(small[i], big[j]) for i, j in zip(ia, ib)])
        if method == "distance":
            bad = np.flatnonzero(got != exp)
        else:
            bad = np.flatnonzero(got != exp.astype(bool))
        assert bad.size == 0, (
            f"{method}: {bad.size} mismatches; first: pair "
            f"({small[ia[bad[0]]]}, {big[ib[bad[0]]]}) got={got[bad[0]]} exp={exp[bad[0]]}"
        )


def test_batch_decode_roundtrip():
    geoms = mixed_random(60, seed=11) + pillboxes(3, seed=12)
    batch = _batch(geoms)
    for i, g in enumerate(geoms):
        g2 = to_spec(batch, i)
        assert spec.envelope(g2) == pytest.approx(spec.envelope(g), abs=0.0)
        assert tuple(batch.bbox[i]) == spec.envelope(g)


def test_mixed_random_equivalence():
    small = mixed_random(28, seed=100)
    big = mixed_random(28, seed=200)
    _cross_check(small, big)


def test_mixed_random_equivalence_second_seed():
    small = mixed_random(24, seed=300)
    big = mixed_random(24, seed=301)
    _cross_check(small, big)


def test_self_join_equivalence():
    g = mixed_random(25, seed=7)
    _cross_check(g, g)


def test_degenerate_equivalence():
    geoms = []
    for _, small, big, _ in degenerate_cases():
        geoms.extend(small)
        if big is not None:
            geoms.extend(big)
    # add extra boundary-sitting probes
    geoms += [
        Point(0.0, 0.0),
        Point(1.0, 0.0),
        Rect(0.0, 0.0, 1.0, 1.0),
        Rect(1.0, 0.0, 2.0, 1.0),  # touching edge
        Triangle(0.0, 0.0, 1.0, 1.0, 2.0, 2.0),  # collinear
        Line(0.0, 0.0, 2.0, 0.0),
        Line(1.0, 0.0, 3.0, 0.0),  # collinear overlap
        LineString(((0.0, 0.0), (1.0, 0.0), (1.0, 1.0))),
        Polygon.new([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]),
        Polygon.new(
            [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)],
            [[(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)]],
        ),
    ]
    _cross_check(geoms, geoms)


def test_pillbox_equivalence():
    pb = pillboxes(12, seed=5, width=100.0, height=50.0)  # dense plane → overlaps
    _cross_check(pb, pb)


def test_polygon_hole_cases():
    holed = Polygon.new(
        [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)],
        [[(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)]],
    )
    probes = [
        Point(5.0, 5.0),  # in hole
        Point(1.0, 1.0),  # in material
        Point(0.0, 5.0),  # on exterior boundary
        Point(2.0, 5.0),  # on hole boundary
        Line(4.0, 4.0, 6.0, 6.0),  # inside hole
        Line(1.0, 1.0, 9.0, 1.0),  # through material
        Rect(3.0, 3.0, 7.0, 7.0),  # rect inside hole
        Rect(-1.0, -1.0, 11.0, 11.0),  # rect containing everything
        Triangle(4.0, 4.0, 6.0, 4.0, 5.0, 6.0),  # tri in hole
        LineString(((3.0, 3.0), (7.0, 3.0), (7.0, 7.0))),
        Polygon.new([(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)]),  # poly in hole
    ]
    _cross_check([holed], probes)
    _cross_check(probes, [holed])
    _cross_check(probes, probes)


def test_linestring_contains_walk_vectorized():
    """The geo 'look_for' walk (spanning collinear segments) and the LS⊇LS
    any/all composition, vectorized == scalar."""
    from rayjoin.geom.spec import Line, LineString

    cases_a = [
        LineString(((0.0, 0.0), (2.0, 0.0), (4.0, 0.0), (4.0, 4.0))),
        LineString(((0.0, 0.0), (1.0, 1.0), (2.0, 2.0))),
        LineString(((0.0, 0.0), (2.0, 0.0))),
    ]
    cases_b = [
        Line(1.0, 0.0, 3.0, 0.0),  # spans two collinear segments
        Line(3.0, 0.0, 4.0, 1.0),
        Line(0.0, 0.0, 4.0, 0.0),
        Line(0.5, 0.5, 1.5, 1.5),
        LineString(((1.0, 0.0), (3.0, 0.0))),
        LineString(((0.0, 0.0), (1.0, 1.0))),
        LineString(((1.0, 0.0), (3.0, 0.0), (4.0, 1.0))),
    ]
    _cross_check(cases_a, cases_b, methods=("contains",))
