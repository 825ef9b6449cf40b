"""Partitioned (PBSM) join path ≡ broadcast path ≡ oracle."""

import numpy as np
import pytest

from rayjoin.config import Config, Interaction
from rayjoin.fixtures import mixed_random, pillboxes
from rayjoin.geom import encode
from rayjoin.oracle import slow_prox_map, slow_spatial_join


def _ds(geoms, blocks=3):
    import ray.data

    return ray.data.from_arrow(encode.geoms_to_table(geoms)).repartition(blocks)


def _rows(ds):
    df = ds.to_pandas()
    return sorted(map(tuple, df[list(df.columns)].itertuples(index=False)))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("interaction", list(Interaction))
def test_partitioned_join_matches_oracle(interaction):
    from rayjoin.join.partitioned import partitioned_spatial_join

    small = mixed_random(40, seed=51)
    big = mixed_random(50, seed=52)
    got = _rows(partitioned_spatial_join(_ds(big), _ds(small), interaction, target_cells=64))
    exp = slow_spatial_join(small, big, interaction)
    assert got == [tuple(r) for r in exp]


@pytest.mark.usefixtures("ray_session")
def test_partitioned_prox_matches_oracle():
    from rayjoin.join.partitioned import partitioned_proximity_map

    small = mixed_random(30, seed=61)
    big = mixed_random(30, seed=62)
    cfg = Config(max_distance=0.7)
    got = _rows(partitioned_proximity_map(_ds(big), _ds(small), cfg, target_cells=49))
    exp = slow_prox_map(small, big, 0.7)
    assert got == [tuple(r) for r in exp]  # exact distances


@pytest.mark.usefixtures("ray_session")
def test_partitioned_matches_broadcast_on_pillboxes():
    from rayjoin.join.broadcast import SpatialIndex
    from rayjoin.join.partitioned import partitioned_spatial_join

    pb = pillboxes(300, seed=9, width=800.0, height=400.0)
    t = encode.geoms_to_table(pb)
    bro = _rows(SpatialIndex(t).spatial_join(_ds(pb, 4), Interaction.INTERSECTS))
    par = _rows(
        partitioned_spatial_join(_ds(pb, 4), _ds(pb, 4), Interaction.INTERSECTS, target_cells=100)
    )
    assert par == bro
    # no duplicate pairs from replication (reference-point suppression)
    assert len(par) == len(set(par))


@pytest.mark.usefixtures("ray_session")
def test_hot_cell_salting_preserves_rows():
    """Skewed input (everything piled into one region) forces hot-cell salts;
    the salted output must equal the broadcast row set exactly."""
    from rayjoin.join.broadcast import SpatialIndex
    from rayjoin.join.partitioned import GridSpec, partitioned_spatial_join

    rng = np.random.default_rng(4)
    # 300 geoms: 90% share the IDENTICAL center (equi-depth boundaries
    # cannot split coincident centers — the case salting exists for),
    # 10% spread out
    from rayjoin.geom.spec import Rect

    geoms = []
    for i in range(300):
        if i % 10 == 0:
            cx, cy = rng.uniform(0, 100, 2)
        else:
            cx, cy = 50.0, 50.0  # unsplittable hot spot
        w, h = rng.uniform(0.1, 1.0, 2)
        geoms.append(Rect(cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2))
    t = encode.geoms_to_table(geoms)
    ds = _ds(geoms, 4)
    grid = GridSpec.plan(ds, ds, target_cells=36)
    assert grid.salts, "skewed sample should produce at least one salted cell"
    par = _rows(partitioned_spatial_join(ds, ds, Interaction.INTERSECTS, target_cells=36))
    bro = _rows(SpatialIndex(t).spatial_join(ds, Interaction.INTERSECTS))
    assert par == bro
    assert len(par) == len(set(par))  # no duplicates from salt replication


@pytest.mark.usefixtures("ray_session")
def test_partitioned_equals_broadcast_randomized():
    """Seeded sweep over geometry mixes, cell counts and interactions: the
    PBSM path must always produce the broadcast row set."""
    from rayjoin.join.broadcast import SpatialIndex
    from rayjoin.join.partitioned import partitioned_spatial_join

    rng = np.random.default_rng(123)
    for trial in range(5):
        ns, nb = int(rng.integers(5, 45)), int(rng.integers(5, 45))
        cells = int(rng.choice([4, 25, 100, 400]))
        inter = list(Interaction)[trial % 3]
        small = mixed_random(ns, seed=int(rng.integers(1 << 30)))
        big = mixed_random(nb, seed=int(rng.integers(1 << 30)))
        bro = _rows(SpatialIndex(encode.geoms_to_table(small)).spatial_join(_ds(big, 2), inter))
        par = _rows(partitioned_spatial_join(_ds(big, 2), _ds(small, 2), inter, target_cells=cells))
        assert par == bro, (trial, ns, nb, cells, inter)


@pytest.mark.usefixtures("ray_session")
def test_auto_dispatch():
    from rayjoin.join.auto import proximity_map, spatial_join

    small = mixed_random(25, seed=91)
    big = mixed_random(25, seed=92)
    from rayjoin.oracle import slow_spatial_join

    exp = [tuple(r) for r in slow_spatial_join(small, big, Interaction.INTERSECTS)]
    # broadcast route (default threshold)
    got_b = _rows(spatial_join(_ds(big, 2), _ds(small, 2), Interaction.INTERSECTS))
    # forced partitioned route (threshold 0)
    got_p = _rows(
        spatial_join(_ds(big, 2), _ds(small, 2), Interaction.INTERSECTS,
                     broadcast_threshold_rows=0, target_cells=25)
    )
    assert got_b == exp and got_p == exp
    exp2 = [tuple(r) for r in slow_prox_map(small, big, 0.5)]
    got2 = _rows(proximity_map(_ds(big, 2), _ds(small, 2), Config(max_distance=0.5),
                               broadcast_threshold_rows=0, target_cells=16))
    assert got2 == exp2


@pytest.mark.usefixtures("ray_session")
def test_partitioned_knn_matches_broadcast():
    """Two-large-sides kNN reproduces the broadcast kNN rows bit-exactly
    (same kernels, same (distance, small_row_id) tie rule), with and
    without a distance cap, across geometry mixes and grid sizes."""
    from rayjoin.join.broadcast import SpatialIndex
    from rayjoin.join.partitioned import partitioned_knn_join

    rng = np.random.default_rng(77)
    for trial in range(4):
        ns, nb = int(rng.integers(8, 40)), int(rng.integers(8, 40))
        cells = int(rng.choice([4, 16, 64]))
        k = int(rng.integers(1, 6))
        cap = float("inf") if trial % 2 == 0 else 0.9
        small = mixed_random(ns, seed=int(rng.integers(1 << 30)))
        big = mixed_random(nb, seed=int(rng.integers(1 << 30)))
        bro = _rows(
            SpatialIndex(encode.geoms_to_table(small)).knn_join(_ds(big, 2), k=k, max_distance=cap)
        )
        par = _rows(
            partitioned_knn_join(_ds(big, 2), _ds(small, 2), k=k, max_distance=cap,
                                 target_cells=cells)
        )
        assert par == bro, (trial, ns, nb, cells, k, cap)


@pytest.mark.usefixtures("ray_session")
def test_partitioned_knn_k_exceeds_smalls():
    from rayjoin.join.broadcast import SpatialIndex
    from rayjoin.join.partitioned import partitioned_knn_join

    small = mixed_random(3, seed=5)
    big = mixed_random(10, seed=6)
    bro = _rows(SpatialIndex(encode.geoms_to_table(small)).knn_join(_ds(big, 2), k=7))
    par = _rows(partitioned_knn_join(_ds(big, 2), _ds(small, 2), k=7, target_cells=16))
    assert par == bro


@pytest.mark.usefixtures("ray_session")
def test_partitioned_with_geos_matches_broadcast():
    """Partitioned with_geos clones the same payloads as the broadcast
    spatial_join_with_geos (row-wise, compared as sorted tuples)."""
    from rayjoin.join.broadcast import SpatialIndex
    from rayjoin.join.partitioned import partitioned_spatial_join

    small = mixed_random(25, seed=31)
    big = mixed_random(30, seed=32)

    def rows(ds):
        df = ds.to_pandas()
        df = df.sort_values(["big_row_id", "small_row_id"]).reset_index(drop=True)
        return [
            (r.big_row_id, r.small_row_id, r.big_geom_type, str(r.big_coords),
             r.small_geom_type, str(r.small_coords))
            for r in df.itertuples(index=False)
        ]

    bro = rows(SpatialIndex(encode.geoms_to_table(small)).spatial_join_with_geos(
        _ds(big, 2), Interaction.INTERSECTS))
    par = rows(partitioned_spatial_join(_ds(big, 2), _ds(small, 2),
                                        Interaction.INTERSECTS, target_cells=25,
                                        with_geos=True))
    assert par == bro and len(par) > 0


@pytest.mark.usefixtures("ray_session")
def test_hilbert_join_matches_broadcast():
    """The Hilbert-range partitioned join (north-star literal plan) emits
    the broadcast row set exactly across interactions and range counts."""
    from rayjoin.join.broadcast import SpatialIndex
    from rayjoin.join.hilbert import hilbert_spatial_join

    rng = np.random.default_rng(15)
    for trial in range(4):
        ns, nb = int(rng.integers(10, 45)), int(rng.integers(10, 45))
        ranges = int(rng.choice([4, 16, 64]))
        inter = list(Interaction)[trial % 3]
        small = mixed_random(ns, seed=int(rng.integers(1 << 30)))
        big = mixed_random(nb, seed=int(rng.integers(1 << 30)))
        bro = _rows(SpatialIndex(encode.geoms_to_table(small)).spatial_join(_ds(big, 2), inter))
        hil = _rows(
            hilbert_spatial_join(_ds(big, 2), _ds(small, 2), inter,
                                 num_ranges=ranges, resolution=12)
        )
        assert hil == bro, (trial, ns, nb, ranges, inter)
        assert len(hil) == len(set(hil))  # exactly-once ownership


@pytest.mark.usefixtures("ray_session")
def test_hilbert_join_degenerate_out_of_domain():
    """Geometries outside the lat/lon domain clamp to edge tiles — the
    Hilbert plan degrades to fewer effective ranges but the row set stays
    exact (the documented behavior; the grid PBSM is the recommended plan
    for non-geographic planes)."""
    from rayjoin.join.broadcast import SpatialIndex
    from rayjoin.join.hilbert import hilbert_spatial_join

    pb = pillboxes(150, seed=3, width=800.0, height=400.0)  # far outside +-180
    t = encode.geoms_to_table(pb)
    bro = _rows(SpatialIndex(t).spatial_join(_ds(pb, 3), Interaction.INTERSECTS))
    hil = _rows(
        hilbert_spatial_join(_ds(pb, 3), _ds(pb, 3), Interaction.INTERSECTS,
                             num_ranges=16, resolution=8)
    )
    assert hil == bro
    assert len(hil) == len(set(hil))


@pytest.mark.usefixtures("ray_session")
def test_hilbert_hot_range_salting():
    """Coincident-center skew (quantile boundaries cannot split one Hilbert
    id) triggers range salting; the salted row set equals broadcast exactly
    with no duplicates."""
    from rayjoin.geom.spec import Rect
    from rayjoin.join.broadcast import SpatialIndex
    from rayjoin.join.hilbert import HilbertSpec, hilbert_spatial_join

    rng = np.random.default_rng(8)
    geoms = []
    for i in range(300):
        if i % 10 == 0:
            cx, cy = rng.uniform(-5, 5, 2)
        else:
            cx, cy = 1.0, 1.0  # unsplittable hot spot
        w, h = rng.uniform(0.05, 0.3, 2)
        geoms.append(Rect(cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2))
    t = encode.geoms_to_table(geoms)
    ds = _ds(geoms, 4)
    spec = HilbertSpec.plan(ds, ds, num_ranges=16, resolution=12)
    assert spec.salts, "skewed sample should salt at least one range"
    hil = _rows(hilbert_spatial_join(ds, ds, Interaction.INTERSECTS,
                                     num_ranges=16, resolution=12))
    bro = _rows(SpatialIndex(t).spatial_join(ds, Interaction.INTERSECTS))
    assert hil == bro
    assert len(hil) == len(set(hil))


@pytest.mark.usefixtures("ray_session")
def test_auto_dispatch_byte_cap_routes_datasets(monkeypatch):
    """VERDICT r4 #4: the broadcast-bytes guardrail must protect DATASET
    small sides too — metadata byte size (never an execute-the-plan
    fallback) routes an over-cap side to the partitioned plan, and both
    plans still produce the identical row set."""
    import rayjoin.join.auto as auto
    import rayjoin.join.partitioned as part
    from rayjoin.join.auto import _bytes_of
    from rayjoin.oracle import slow_spatial_join

    small = mixed_random(25, seed=91)
    big = mixed_random(25, seed=92)
    small_ds = _ds(small, 2)
    nb = _bytes_of(small_ds)
    assert nb is not None and nb > 0  # from_arrow metadata answers for free

    exp = [tuple(r) for r in slow_spatial_join(small, big, Interaction.INTERSECTS)]
    calls = []
    orig = part.partitioned_spatial_join

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(part, "partitioned_spatial_join", spy)
    monkeypatch.setattr(auto, "DEFAULT_BROADCAST_BYTES", nb - 1)
    got = _rows(auto.spatial_join(_ds(big, 2), small_ds, Interaction.INTERSECTS,
                                  target_cells=25))
    assert calls, "byte cap did not route to the partitioned plan"
    assert got == exp


@pytest.mark.usefixtures("ray_session")
def test_rows_probe_cached_single_execution():
    """VERDICT r4 #7: when plan selection must probe an un-metadata'd
    upstream with limit(threshold+1).count(), the result is cached per
    Dataset object — a second dispatch over the same upstream must NOT
    execute it again (asserted via a counting map stage)."""
    import pyarrow as pa
    import ray
    import ray.data

    from rayjoin.join import auto
    from rayjoin.util import meta_row_count

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def inc(self):
            self.n += 1

        def get(self):
            return self.n

    c = Counter.remote()

    def bump(b):
        ray.get(c.inc.remote())
        return b

    t = pa.table({"x": pa.array(np.arange(1000, dtype=np.int64))})
    ds = ray.data.from_arrow(t).map_batches(bump, batch_format="pyarrow", batch_size=500)
    assert meta_row_count(ds) is None  # else the probe path isn't exercised

    n1 = auto._rows_of(ds, 10_000)
    execs = ray.get(c.get.remote())
    assert n1 == 1000 and execs >= 1
    # exact count cached: any further threshold answers without execution
    assert auto._rows_of(ds, 10_000) == 1000
    assert auto._rows_of(ds, 5) == 1000
    assert ray.get(c.get.remote()) == execs

    # truncated probe: small threshold gives only a lower bound...
    c2 = Counter.remote()

    def bump2(b):
        ray.get(c2.inc.remote())
        return b

    ds2 = ray.data.from_arrow(t).map_batches(bump2, batch_format="pyarrow", batch_size=100)
    lo = auto._rows_of(ds2, 50)
    assert lo > 50  # above threshold, exact value is plan-dependent
    e1 = ray.get(c2.get.remote())
    # ...reusable for any threshold <= probed one, no re-execution
    assert auto._rows_of(ds2, 50) == lo
    assert auto._rows_of(ds2, 10) > 10
    assert ray.get(c2.get.remote()) == e1
    # a LARGER threshold needs a fresh probe (the bound can't answer)
    assert auto._rows_of(ds2, 10_000) == 1000
    assert ray.get(c2.get.remote()) > e1
    # and the fresh (now exact) result replaces the truncated entry
    e2 = ray.get(c2.get.remote())
    assert auto._rows_of(ds2, 7) == 1000
    assert ray.get(c2.get.remote()) == e2
