"""Banded Levenshtein kernel + blocked fuzzy-join operator."""
import numpy as np
import pyarrow as pa
import pytest


def _lev(a, b):
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev = dp[0]; dp[0] = i
        for j in range(1, lb + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[lb]


def test_banded_levenshtein_exact_all_k():
    from rayjoin.functions.fuzzy import banded_levenshtein

    rng = np.random.default_rng(1)
    alpha = list("abcde")
    cases = []
    for _ in range(800):
        la, lb = rng.integers(0, 12, 2)
        cases.append(("".join(rng.choice(alpha, la)), "".join(rng.choice(alpha, lb))))
    for _ in range(400):  # structured near-pairs around the band edge
        s = "".join(rng.choice(alpha, rng.integers(5, 15)))
        t = list(s)
        for _ in range(rng.integers(0, 4)):
            op, p = rng.integers(0, 3), int(rng.integers(0, max(len(t), 1)))
            if op == 0 and t:
                t[p % len(t)] = rng.choice(alpha)
            elif op == 1:
                t.insert(p, rng.choice(alpha))
            elif op == 2 and t:
                del t[p % len(t)]
        cases.append((s, "".join(t)))
    a = np.array([c[0] for c in cases], object)
    b = np.array([c[1] for c in cases], object)
    for k in (0, 1, 2, 3, 8):
        got = banded_levenshtein(a, b, k)
        exp = np.array([min(_lev(x, y), k + 1) for x, y in cases])
        assert (got == exp).all()


@pytest.mark.usefixtures("ray_session")
def test_edit_distance_pairs_blocked():
    import ray.data

    from rayjoin.functions.fuzzy import edit_distance_pairs

    rows = [
        (0, "hostA", "http://a/x1"),
        (1, "hostA", "http://a/x2"),     # dist 1 to 0
        (2, "hostA", "http://a/zzzzz"),  # far from both
        (3, "hostB", "http://a/x1"),     # same string, different block -> no pair
        (4, "hostB", "http://b/y"),
        (5, "hostC", "solo"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "host": pa.array([r[1] for r in rows]),
        "url": pa.array([r[2] for r in rows]),
    })
    out = edit_distance_pairs(
        ray.data.from_arrow(t).repartition(2), id_col="doc_id",
        str_col="url", key_col="host", max_dist=2,
    ).to_pandas().sort_values(["id_a", "id_b"])
    assert list(zip(out.id_a, out.id_b, out.dist)) == [(0, 1, 1)]
    # loud guard on pathological blocks
    big = pa.table({
        "doc_id": pa.array(np.arange(100), pa.int64()),
        "host": pa.array(["same"] * 100),
        "url": pa.array([f"u{i}" for i in range(100)]),
    })
    with pytest.raises(Exception):
        edit_distance_pairs(
            ray.data.from_arrow(big), id_col="doc_id", str_col="url",
            key_col="host", max_dist=1, max_pairs_per_key=10,
        ).materialize()
