"""WKT reader/writer for the six supported geometry types.

Parity with the reference's datagen path (SURVEY.md §2.1: the reference's
only serialization is WKT/WKB written by ``src/gen_test.py`` and the WKT
round-trip in its libgeos differential test).  RECT and TRIANGLE have no
native WKT tags; like the reference (which converts via geo->WKT), they
serialize as POLYGON rings and parse back as POLYGON.
"""

from __future__ import annotations

import re
from typing import List

from . import spec
from .spec import LINE, LINESTRING, POINT, POLYGON, RECT, TRIANGLE


def _fmt(v: float) -> str:
    return repr(float(v))


def _ring_wkt(pts) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts) + ")"


def to_wkt(g) -> str:
    k = g.kind
    if k == POINT:
        return f"POINT ({_fmt(g.x)} {_fmt(g.y)})"
    if k == LINE:
        return f"LINESTRING ({_fmt(g.sx)} {_fmt(g.sy)}, {_fmt(g.ex)} {_fmt(g.ey)})"
    if k == LINESTRING:
        return "LINESTRING " + _ring_wkt(g.pts)
    if k == POLYGON:
        return "POLYGON (" + ", ".join(_ring_wkt(r) for r in g.rings()) + ")"
    if k == RECT:
        ring = [(g.xmin, g.ymin), (g.xmax, g.ymin), (g.xmax, g.ymax), (g.xmin, g.ymax), (g.xmin, g.ymin)]
        return "POLYGON (" + _ring_wkt(ring) + ")"
    if k == TRIANGLE:
        v = g.vertices()
        return "POLYGON (" + _ring_wkt([*v, v[0]]) + ")"
    raise ValueError(k)


_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"


def _parse_pts(body: str) -> List[tuple]:
    pts = []
    for pair in body.split(","):
        xs = re.findall(_NUM, pair)
        if len(xs) != 2:
            raise ValueError(f"bad coordinate pair: {pair!r}")
        pts.append((float(xs[0]), float(xs[1])))
    return pts


def collection_from_wkt(s: str) -> List:
    """Parse a ``GEOMETRYCOLLECTION (...)`` into the ordered geometry list —
    the exact shape the reference's datagen writes (one shapely
    GeometryCollection per .wkt file, /root/reference/src/gen_test.py:25-33);
    the element POSITION is the reference's row identity.  A bare geometry
    parses as a 1-element collection."""
    s = s.strip()
    m = re.match(r"(?i)^GEOMETRYCOLLECTION\s*\((.*)\)$", s, re.S)
    if not m:
        return [from_wkt(s)]
    body = m.group(1)
    out, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(from_wkt(body[start:i]))
            start = i + 1
    tail = body[start:].strip()
    if tail:
        out.append(from_wkt(tail))
    return out


def from_wkt(s: str):
    s = s.strip()
    m = re.match(r"(?i)^(POINT|LINESTRING|POLYGON)\s*\((.*)\)$", s, re.S)
    if not m:
        raise ValueError(f"unsupported WKT: {s[:60]!r}")
    tag = m.group(1).upper()
    body = m.group(2).strip()
    if tag == "POINT":
        (p,) = _parse_pts(body)
        return spec.Point(*p)
    if tag == "LINESTRING":
        pts = _parse_pts(body)
        if len(pts) == 2:
            return spec.Line(*pts[0], *pts[1])
        return spec.LineString(tuple(pts))
    # POLYGON: one or more parenthesized rings
    rings = [
        _parse_pts(r) for r in re.findall(r"\(([^()]*)\)", body)
    ]
    if not rings:
        raise ValueError("POLYGON with no rings")
    return spec.Polygon.new(rings[0], rings[1:])
