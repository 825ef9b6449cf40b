"""DSIR importance scores/selection (rayjoin/functions/dsir.py):
planted-vocabulary behavior, partial-top-k vs full sort, determinism."""

import numpy as np
import pyarrow as pa
import pytest


def _docs(n_target=40, n_other=60, seed=3) -> pa.Table:
    """Target docs draw from vocabulary A, others from B, with a little
    crossover so the models overlap; ids interleave the groups."""
    rng = np.random.default_rng(seed)
    texts, langs = [], []
    for i in range(n_target + n_other):
        tgt = i % 5 < 2  # interleaved: ids 0,1 mod 5 are target
        vocab = ([f"alpha{j}" for j in range(30)] if tgt
                 else [f"beta{j}" for j in range(30)])
        cross = [f"beta{j}" for j in range(5)] if tgt else \
                [f"alpha{j}" for j in range(5)]
        toks = list(rng.choice(vocab, size=40)) + list(rng.choice(cross, size=4))
        texts.append(" ".join(toks))
        langs.append("en" if tgt else "xx")
    return pa.table({
        "doc_id": pa.array(np.arange(n_target + n_other, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
    })


@pytest.mark.usefixtures("ray_session")
def test_dsir_scores_separate_planted_vocabularies():
    import ray.data

    from rayjoin.functions.dsir import dsir_scores

    tab = _docs()
    ds = ray.data.from_arrow(tab).repartition(5)
    df = dsir_scores(ds, target_value="en").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    is_tgt = np.array([v == "en" for v in tab["lang"].to_pylist()])
    s = df["dsir_micro"].to_numpy()
    # every target doc must outrank every non-target doc
    assert s[is_tgt].min() > s[~is_tgt].max()
    assert (df["n_tokens"] == 44).all()


@pytest.mark.usefixtures("ray_session")
def test_dsir_select_matches_full_sort_and_is_deterministic():
    import ray.data

    from rayjoin.functions.dsir import dsir_scores, dsir_select

    tab = _docs(seed=11)
    ds = ray.data.from_arrow(tab).repartition(7)
    sel = dsir_select(ds, k=25, target_value="en").to_pandas()
    df = dsir_scores(ds, target_value="en").to_pandas()
    want = df.sort_values(["dsir_micro", "doc_id"],
                          ascending=[False, True]).head(25)
    assert sel["doc_id"].tolist() == want["doc_id"].tolist()
    assert sel["dsir_micro"].tolist() == want["dsir_micro"].tolist()
    assert sel["rank"].tolist() == list(range(25))
    sel2 = dsir_select(ds, k=25, target_value="en").to_pandas()
    assert sel.equals(sel2)


@pytest.mark.usefixtures("ray_session")
def test_dsir_blocking_invariance():
    """Histogram partials and scores are integer sums — any repartition
    must give bit-identical scores."""
    import ray.data

    from rayjoin.functions.dsir import dsir_scores

    tab = _docs(seed=23)
    a = dsir_scores(ray.data.from_arrow(tab), target_value="en") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = dsir_scores(ray.data.from_arrow(tab).repartition(9),
                    target_value="en") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
