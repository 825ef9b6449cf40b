"""STRtree candidate generation == brute-force inclusive bbox overlap."""

import numpy as np

from rayjoin.state.rtree import STRtree, dilate


def _rand_boxes(rng, n, scale=100.0):
    p = rng.uniform(0, scale, size=(n, 2))
    wh = rng.uniform(0, scale / 10, size=(n, 2))
    return np.column_stack([p[:, 0], p[:, 1], p[:, 0] + wh[:, 0], p[:, 1] + wh[:, 1]])


def _brute(qbox, ebox):
    hits = ~(
        (qbox[:, None, 0] > ebox[None, :, 2])
        | (qbox[:, None, 2] < ebox[None, :, 0])
        | (qbox[:, None, 1] > ebox[None, :, 3])
        | (qbox[:, None, 3] < ebox[None, :, 1])
    )
    q, e = np.nonzero(hits)
    return set(zip(q.tolist(), e.tolist()))


def test_query_matches_bruteforce():
    rng = np.random.default_rng(42)
    for n, m in [(0, 5), (1, 3), (7, 7), (300, 200), (2000, 100)]:
        ebox = _rand_boxes(rng, n)
        qbox = _rand_boxes(rng, m)
        tree = STRtree(ebox)
        q, e = tree.query(qbox)
        assert set(zip(q.tolist(), e.tolist())) == _brute(qbox, ebox)


def test_touching_boxes_are_candidates():
    # inclusive overlap (rstar locate_in_envelope_intersecting semantics)
    ebox = np.array([[0.0, 0.0, 1.0, 1.0]])
    tree = STRtree(ebox)
    q, e = tree.query(np.array([[1.0, 1.0, 2.0, 2.0]]))
    assert q.size == 1
    q, e = tree.query(np.array([[1.0001, 0.0, 2.0, 1.0]]))
    assert q.size == 0


def test_dilate_for_proximity():
    # pair at exactly max_distance along an axis must be a candidate
    ebox = np.array([[0.0, 0.0, 0.0, 0.0]])
    tree = STRtree(dilate(ebox, 5.0))
    q, e = tree.query(np.array([[5.0, 0.0, 5.0, 0.0]]))
    assert q.size == 1


def test_custom_ids():
    rng = np.random.default_rng(1)
    ebox = _rand_boxes(rng, 50)
    ids = np.arange(50) * 10 + 3
    tree = STRtree(ebox, ids=ids)
    q, e = tree.query(ebox[:5])
    assert set(e.tolist()) <= set(ids.tolist())
    # each box overlaps itself
    for i in range(5):
        assert ids[i] in e[q == i]
