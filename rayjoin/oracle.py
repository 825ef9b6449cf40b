"""Naive O(n^2) join oracle — the semantic spec for the distributed joins.

Python port of the reference's in-crate oracle
(/root/reference/src/naive.rs:109-158): nested loops over (small, big),
reusing the Relates spec kernels, results sorted by (big, small) exactly as
the reference tests compare (/root/reference/src/lib.rs:404-405).
"""

from __future__ import annotations

import heapq
from typing import List, Sequence, Tuple

from .config import Interaction
from .geom import spec


def slow_prox_map(small: Sequence, big: Sequence, max_distance: float) -> List[Tuple[int, int, float]]:
    """Rows (big_index, small_index, distance); include iff distance <= max_distance
    (inclusive, /root/reference/src/index.rs:438)."""
    result = []
    for ai, a in enumerate(small):
        for bi, b in enumerate(big):
            d = spec.distance(a, b)
            if d <= max_distance:
                result.append((bi, ai, d))
    result.sort(key=lambda r: (r[0], r[1]))
    return result


def slow_spatial_join(
    small: Sequence, big: Sequence, interaction: Interaction
) -> List[Tuple[int, int]]:
    """Rows (big_index, small_index); semantics /root/reference/src/index.rs:497-534:
    INTERSECTS -> small.Intersects(big); CONTAINS -> small.Contains(big);
    WITHIN -> big.Contains(small)."""
    result = []
    for ai, a in enumerate(small):
        for bi, b in enumerate(big):
            if interaction is Interaction.INTERSECTS:
                include = spec.intersects(a, b)
            elif interaction is Interaction.CONTAINS:
                include = spec.contains(a, b)
            else:
                include = spec.contains(b, a)
            if include:
                result.append((bi, ai))
    result.sort()
    return result


def slow_knn(
    small: Sequence, big: Sequence, k: int, max_distance: float = float("inf")
) -> List[Tuple[int, int, float]]:
    """kNN join oracle (new engine scope, BASELINE.json:north_rule).

    For each big geometry: the k nearest smalls by EuclideanDistance, ties
    broken by small index (deterministic order (distance, small_index),
    SURVEY.md §7 hard part (d)); optional distance cap (inclusive).
    """
    result = []
    for bi, b in enumerate(big):
        cands = []
        for ai, a in enumerate(small):
            d = spec.distance(a, b)
            if d <= max_distance:
                cands.append((d, ai))
        for d, ai in heapq.nsmallest(k, cands):
            result.append((bi, ai, d))
    result.sort(key=lambda r: (r[0], r[2], r[1]))
    return result
