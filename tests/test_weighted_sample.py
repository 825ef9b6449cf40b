"""weighted_sample (corpus_ops.py): ES-equivalence via min-of-w draws —
brute-force parity, partitioning invariance, weight bias, k >= n."""

import numpy as np
import pyarrow as pa


def _brute(ids, texts, k):
    """Per-doc Python loop over the same double-hash draws."""
    import pyarrow.compute as pc

    from rayjoin.stages.geocode import fnv1a64

    rows = []
    for i, txt in zip(ids, texts):
        s = pa.array([str(i)], pa.string())
        h1 = int(fnv1a64(s)[0])
        h2 = int(fnv1a64(pc.binary_join_element_wise(s, "#", ""))[0])
        w = len(txt.split(" "))
        prio = min((h1 + j * h2) % (1 << 64) for j in range(w))
        rows.append((prio, i))
    rows.sort()
    return rows[:k]


def _run(ids, texts, k, parts=3):
    import ray
    import ray.data

    from rayjoin.functions.corpus_ops import weighted_sample

    tab = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    return weighted_sample(
        ray.data.from_arrow(tab).repartition(parts), k=k)


def test_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    ids = list(range(40))
    texts = [" ".join("tok%d" % j for j in range(rng.integers(1, 30)))
             for _ in ids]
    out = _run(ids, texts, k=10)
    exp = _brute(ids, texts, k=10)
    got_ids = out["doc_id"].to_pylist()
    got_prio = [p % (1 << 64) if p >= 0 else p + (1 << 64)
                for p in out["prio_i64"].to_pylist()]
    assert got_ids == [i for _, i in exp]
    assert got_prio == [p for p, _ in exp]
    assert out["rank"].to_pylist() == list(range(10))


def test_partitioning_invariant(ray_session):
    ids = list(range(60))
    texts = ["x " * (i % 9 + 1) for i in ids]
    a = _run(ids, texts, k=15, parts=1)
    b = _run(ids, texts, k=15, parts=7)
    assert a.equals(b)


def test_heavier_docs_win_more(ray_session):
    # 1000 docs of weight 1, 1000 of weight 50; expected heavy share of a
    # k=200 sample is ~ 50/51 (~196).  Assert a loose lower bound.
    n = 1000
    ids = list(range(2 * n))
    texts = ["a"] * n + ["a " * 50] * n
    out = _run(ids, texts, k=200, parts=4)
    heavy = sum(1 for i in out["doc_id"].to_pylist() if i >= n)
    assert heavy > 150


def test_k_exceeds_n_and_empty_text(ray_session):
    ids = [1, 2, 3]
    texts = ["", "one two", "x"]
    out = _run(ids, texts, k=10, parts=2)
    assert out.num_rows == 3
    assert out["rank"].to_pylist() == [0, 1, 2]
    # empty text still carries weight 1 (string_split parity) and can win
    assert set(out["doc_id"].to_pylist()) == {1, 2, 3}
