"""Text-analysis kernels: the Arrow-vectorized LangId must reproduce the
naive per-token reference exactly (the langid_counts oracle reproduces the
same argmax in SQL), on edge cases and real testdata."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from t_digest_ray.functions.text import _STOPWORDS, LangId, tokens_series


def naive_predict(texts: pd.Series) -> np.ndarray:
    """The pre-vectorization reference implementation (per-token Python)."""
    profiles = sorted(_STOPWORDS.items())
    toks = tokens_series(texts)
    n = toks.map(len).to_numpy()
    best_score = np.zeros(len(texts))
    best_lang = np.full(len(texts), "und", dtype=object)
    for lang, words in profiles:
        score = toks.map(lambda ts, w=words: sum(t in w for t in ts)) \
            .to_numpy() / np.maximum(n, 1)
        better = score > best_score
        best_score = np.where(better, score, best_score)
        best_lang[better] = lang
    best_lang[best_score <= 0.0] = "und"
    return best_lang


EDGE_TEXTS = [
    "",                      # empty -> und
    None,                    # null -> und
    "   \t \n ",             # whitespace only -> und
    "the der",               # tie de vs en -> alphabetical first (de)
    "THE AND OF",            # case folding
    "de de de",              # 'de' is a stopword of fr/nl/pt -> tie by alpha
    "zz yy xx",              # no stopword -> und
    "  the   and  of to a in is that it for  ",  # edge whitespace
    "la la la que",          # es/fr/it overlap
]


def test_langid_matches_naive_on_edges():
    s = pd.Series(EDGE_TEXTS)
    got = LangId().predict(s)
    want = naive_predict(s)
    assert list(got) == list(want)
    assert got[0] == "und" and got[1] == "und" and got[2] == "und"
    assert got[6] == "und"


def test_langid_matches_naive_random():
    rng = np.random.default_rng(7)
    vocab = (["the", "and", "der", "die", "le", "la", "el", "het", "de",
              "que", "e", "a"] + [f"w{i}" for i in range(50)])
    texts = pd.Series([" ".join(rng.choice(vocab, rng.integers(0, 40)))
                       for _ in range(500)])
    assert list(LangId().predict(texts)) == list(naive_predict(texts))


def test_langid_matches_naive_on_testdata():
    t = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                        columns=["text"])
    assert list(LangId().predict(t["text"])) == list(naive_predict(t["text"]))


def test_langid_arrow_and_pandas_paths_agree():
    s = pd.Series(EDGE_TEXTS)
    li = LangId()
    tbl = pa.table({"text": pa.array(s, type=pa.string())})
    out = li(tbl)
    assert isinstance(out, pa.Table)
    assert out.column("lang_pred").to_pylist() == list(li.predict(s))
    # pandas batch path keeps working
    df = pd.DataFrame({"text": s})
    out_pd = li(df)
    assert list(out_pd["lang_pred"]) == list(li.predict(s))
