"""WKB (well-known binary) writer/reader for the 6 supported types.

Datagen parity with the reference, whose fixture generator writes both WKT
and WKB files (/root/reference/src/gen_test.py:25-33).  Mapping follows the
same convention as the WKT module: Point -> wkbPoint(1), Line/LineString ->
wkbLineString(2), Rect/Triangle/Polygon -> wkbPolygon(3) with closed rings
(Rect and Triangle have no native WKB geometry type, so they round-trip as
Polygons with the identical boundary — the exact shape shapely emits for the
reference's pill-box fixtures).  Little-endian, no SRID.
"""

from __future__ import annotations

import struct
from typing import List

from . import spec
from .spec import LINE, LINESTRING, POINT, POLYGON, RECT, TRIANGLE

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3


def _ring_points(g) -> List[tuple]:
    k = g.kind
    if k == RECT:
        return [
            (g.xmin, g.ymin), (g.xmin, g.ymax), (g.xmax, g.ymax),
            (g.xmax, g.ymin), (g.xmin, g.ymin),
        ]
    if k == TRIANGLE:
        return [(g.ax, g.ay), (g.bx, g.by), (g.cx, g.cy), (g.ax, g.ay)]
    raise AssertionError(k)


def _closed(ring) -> List[tuple]:
    pts = list(ring)
    if pts and pts[0] != pts[-1]:
        pts.append(pts[0])
    return pts


def to_wkb(g) -> bytes:
    """Spec geometry -> WKB bytes (little-endian)."""
    k = g.kind
    if k == POINT:
        return struct.pack("<BIdd", 1, _WKB_POINT, g.x, g.y)
    if k == LINE:
        pts = [(g.sx, g.sy), (g.ex, g.ey)]
        body = b"".join(struct.pack("<dd", x, y) for x, y in pts)
        return struct.pack("<BII", 1, _WKB_LINESTRING, len(pts)) + body
    if k == LINESTRING:
        pts = list(g.pts)
        body = b"".join(struct.pack("<dd", x, y) for x, y in pts)
        return struct.pack("<BII", 1, _WKB_LINESTRING, len(pts)) + body
    if k in (RECT, TRIANGLE, POLYGON):
        rings = (
            [_closed(r) for r in g.rings()] if k == POLYGON else [_ring_points(g)]
        )
        out = struct.pack("<BII", 1, _WKB_POLYGON, len(rings))
        for ring in rings:
            out += struct.pack("<I", len(ring))
            out += b"".join(struct.pack("<dd", x, y) for x, y in ring)
        return out
    raise AssertionError(f"unknown kind {k}")


_WKB_GEOMETRYCOLLECTION = 7


def collection_from_wkb(buf: bytes) -> List:
    """Parse a wkbGeometryCollection(7) into the ordered geometry list
    (the reference's .wkb datagen shape); a bare geometry parses as a
    1-element collection."""
    (endian,) = struct.unpack_from("<B", buf, 0)
    fmt = "<" if endian == 1 else ">"
    (code,) = struct.unpack_from(fmt + "I", buf, 1)
    if code != _WKB_GEOMETRYCOLLECTION:
        return [from_wkb(buf)]
    (n,) = struct.unpack_from(fmt + "I", buf, 5)
    off = 9
    out = []
    for _ in range(n):
        g, off = _parse(buf, off)
        out.append(g)
    if off != len(buf):
        raise ValueError(f"trailing bytes after WKB collection: {len(buf) - off}")
    return out


def from_wkb(buf: bytes):
    """WKB bytes -> spec geometry (Point / Line / LineString / Polygon).
    Unsupported geometry types raise ValueError, matching the reference's
    conversion contract (/root/reference/src/conv.rs:51 unimplemented!)."""
    geom, off = _parse(buf, 0)
    if off != len(buf):
        raise ValueError(f"trailing bytes after WKB geometry: {len(buf) - off}")
    return geom


def _parse(buf: bytes, off: int):
    (endian,) = struct.unpack_from("<B", buf, off)
    fmt = "<" if endian == 1 else ">"
    (code,) = struct.unpack_from(fmt + "I", buf, off + 1)
    off += 5
    if code == _WKB_POINT:
        x, y = struct.unpack_from(fmt + "dd", buf, off)
        return spec.Point(x, y), off + 16
    if code == _WKB_LINESTRING:
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        pts = [struct.unpack_from(fmt + "dd", buf, off + 16 * i) for i in range(n)]
        off += 16 * n
        if n == 2:
            return spec.Line(*pts[0], *pts[1]), off
        return spec.LineString(tuple(pts)), off
    if code == _WKB_POLYGON:
        (nr,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt + "I", buf, off)
            off += 4
            pts = [struct.unpack_from(fmt + "dd", buf, off + 16 * i) for i in range(n)]
            off += 16 * n
            rings.append(tuple(pts))
        return spec.Polygon.new(rings[0], rings[1:]), off
    raise ValueError(f"unsupported WKB geometry code {code}")
