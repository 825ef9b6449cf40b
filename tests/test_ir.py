"""inverted_index / tfidf: reference parity, plan parity, edge shapes."""
import math
from collections import Counter

import numpy as np
import pyarrow as pa

from rayjoin.functions.text import inverted_index, tfidf


def _docs_ds(texts, blocks=3):
    import ray.data

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return ray.data.from_arrow(t).repartition(blocks)


TEXTS = [
    "a b b c",
    "b c c c d",
    "a a a",
    "",                 # -> single empty-string token, same as SQL string_split
    "d d a b",
]


def _ref_postings(texts):
    out = {}
    for i, s in enumerate(texts):
        for tok, tf in Counter(s.split(" ")).items():
            out[(i, tok)] = tf
    return out


def test_inverted_index_matches_reference(ray_session):
    got = inverted_index(_docs_ds(TEXTS)).to_pandas()
    ref = _ref_postings(TEXTS)
    assert len(got) == len(ref)
    for _, r in got.iterrows():
        assert ref[(r["doc_id"], r["token"])] == r["tf"]


def test_tfidf_matches_reference_and_plans_agree(ray_session):
    n = len(TEXTS)
    ref = _ref_postings(TEXTS)
    dfs = Counter(tok for (_, tok) in ref)
    a = (tfidf(_docs_ds(TEXTS), n_docs=n)
         .to_pandas().sort_values(["doc_id", "token"]).reset_index(drop=True))
    for _, r in a.iterrows():
        assert r["df"] == dfs[r["token"]]
        expect = ref[(r["doc_id"], r["token"])] * math.log(n / dfs[r["token"]])
        assert r["tfidf"] == expect, (r["token"], r["tfidf"], expect)
    # join plan (forced via broadcast_vocab_rows=0) must agree bit-for-bit
    b = (tfidf(_docs_ds(TEXTS, blocks=5), n_docs=n, broadcast_vocab_rows=0)
         .to_pandas().sort_values(["doc_id", "token"]).reset_index(drop=True))
    assert (a["tfidf"].to_numpy().view(np.int64)
            == b["tfidf"].to_numpy().view(np.int64)).all()
    assert a[["doc_id", "tf", "df"]].equals(b[["doc_id", "tf", "df"]])


def test_inverted_index_partition_invariant(ray_session):
    a = (inverted_index(_docs_ds(TEXTS, 1)).to_pandas()
         .sort_values(["doc_id", "token"]).reset_index(drop=True))
    b = (inverted_index(_docs_ds(TEXTS, 5)).to_pandas()
         .sort_values(["doc_id", "token"]).reset_index(drop=True))
    assert a.equals(b)
