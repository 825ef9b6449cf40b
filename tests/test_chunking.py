"""chunk_documents (corpus_ops.py): byte-span extraction edge cases —
unicode, empty tokens, exact window boundaries, overlap reconstruction."""

import numpy as np
import pyarrow as pa
import pytest


def _run(texts, window, stride):
    import ray
    import ray.data

    from rayjoin.functions.corpus_ops import chunk_documents

    tab = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    out = chunk_documents(ray.data.from_arrow(tab).repartition(2),
                          window=window, stride=stride)
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(tabs)
    df = t.to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    return df


def _reference(text, window, stride):
    toks = text.split(" ")
    out = []
    c = 0
    while c * stride < len(toks):
        seg = toks[c * stride: c * stride + window]
        out.append((c, len(seg), " ".join(seg)))
        c += 1
    return out


@pytest.mark.usefixtures("ray_session")
def test_chunking_matches_python_reference_on_edge_cases():
    texts = [
        "",                                   # one empty token -> one chunk
        "solo",                               # single token
        " ".join(f"t{i}" for i in range(64)),   # exactly one window
        " ".join(f"t{i}" for i in range(65)),   # one token past the window
        " ".join(f"t{i}" for i in range(96)),   # 2 overlapping chunks
        "a  b   c",                           # empty tokens from runs
        " ".join(["héllo", "wörld", "日本語"] * 30),  # multi-byte utf-8
        "x " * 200,                           # trailing space -> empty token
    ]
    df = _run(texts, window=64, stride=48)
    for did, text in enumerate(texts):
        got = df[df["doc_id"] == did]
        want = _reference(text, 64, 48)
        assert len(got) == len(want), (did, len(got), len(want))
        for (ci, nt, ct), row in zip(want, got.itertuples()):
            assert row.chunk_idx == ci and row.n_tokens == nt, (did, ci)
            assert row.chunk_text == ct, (did, ci)


@pytest.mark.usefixtures("ray_session")
def test_chunking_overlap_and_small_strides():
    texts = [" ".join(f"w{i}" for i in range(10))]
    df = _run(texts, window=4, stride=2)
    want = _reference(texts[0], 4, 2)
    assert [(r.chunk_idx, r.n_tokens, r.chunk_text)
            for r in df.itertuples()] == want
    # overlap property: consecutive chunks share window - stride tokens
    for a, b in zip(want, want[1:]):
        assert a[2].split(" ")[2:] == b[2].split(" ")[:2]


def test_reassemble_chunks_round_trip(ray_session):
    import ray.data

    from rayjoin.functions.corpus_ops import chunk_documents, reassemble_chunks

    rng = np.random.default_rng(5)
    docs = [" ".join(f"tok{rng.integers(0, 50)}"
                     for _ in range(int(rng.integers(0, 200))))
            for _ in range(300)]
    docs += ["", " ", "  ", "one", "a  b", " lead", "trail "]
    ids = np.arange(len(docs), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(docs, pa.string())})
    ds = ray.data.from_arrow(t).repartition(5)
    for w, s in [(64, 48), (8, 8), (8, 3), (5, 1)]:
        back = (reassemble_chunks(chunk_documents(ds, window=w, stride=s),
                                  window=w, stride=s)
                .to_pandas().sort_values("doc_id"))
        assert back.doc_id.tolist() == ids.tolist(), (w, s)
        assert back.text.tolist() == docs, (w, s)


def test_reassemble_chunks_bad_args(ray_session):
    import ray.data

    from rayjoin.functions.corpus_ops import reassemble_chunks

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "chunk_idx": pa.array([0], pa.int64()),
        "chunk_text": pa.array(["x"], pa.string())}))
    with pytest.raises(ValueError):
        reassemble_chunks(ds, window=4, stride=5)  # stride > window
