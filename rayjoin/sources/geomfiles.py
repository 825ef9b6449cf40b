"""Geometry-file sources: the reference's datagen formats as Ray Datasets.

The reference serializes test corpora as ONE GeometryCollection per
``.wkt``/``.wkb`` file (/root/reference/src/gen_test.py:25-33); a user
switching from the reference loads those files here.  Each file parses
inside a Ray task (``read_binary_files`` -> ``map_batches``), emitting the
standard wire format (``rayjoin.geom.encode.GEOM_SCHEMA``).

Row identity: within a file, ``row_id`` = the element's position in the
collection — exactly the reference's positional identity — plus
``file_index << 32`` when several files are read (files ordered by sorted
path, so ids are deterministic).  Single-file reads therefore reproduce the
reference's indexes verbatim.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Union

import numpy as np
import pyarrow as pa


def _expand(paths: Union[str, Sequence[str]], suffix: str) -> List[str]:
    if isinstance(paths, str):
        if os.path.isdir(paths):
            return sorted(
                os.path.join(paths, f) for f in os.listdir(paths) if f.endswith(suffix)
            )
        return [paths]
    return sorted(paths)


def _reader(files: List[str], parse_collection):
    import ray.data

    from ..geom.encode import geoms_to_table

    order = {p: i for i, p in enumerate(files)}

    def parse(t: pa.Table) -> pa.Table:
        tables = []
        for path, payload in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            geoms = parse_collection(payload)
            base = order[path] << 32 if len(order) > 1 else 0
            tables.append(
                geoms_to_table(geoms, row_ids=np.arange(len(geoms), dtype=np.int64) + base)
            )
        from ..geom.encode import GEOM_SCHEMA

        return pa.concat_tables(tables) if tables else GEOM_SCHEMA.empty_table()

    ds = ray.data.read_binary_files(files, include_paths=True)
    return ds.map_batches(parse, batch_format="pyarrow")


def read_wkt(paths: Union[str, Sequence[str]]):
    """Dataset[row_id, geom_type, coords] from .wkt GeometryCollection
    file(s) (or a directory of them)."""
    from ..geom import wkt

    return _reader(
        _expand(paths, ".wkt"), lambda b: wkt.collection_from_wkt(b.decode("utf-8"))
    )


def read_wkb(paths: Union[str, Sequence[str]]):
    """Dataset[row_id, geom_type, coords] from .wkb GeometryCollection
    file(s) (or a directory of them)."""
    from ..geom import wkb

    return _reader(_expand(paths, ".wkb"), wkb.collection_from_wkb)
