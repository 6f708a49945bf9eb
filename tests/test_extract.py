"""ExtractText: the vectorized Arrow fast path must byte-match the
per-row reference loop on adversarial inputs (nulls, malformed html,
overlapping/missing delimiters, multi-byte UTF-8, sliced arrays), and
invalid UTF-8 must fall back without raising."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from t_digest_ray.sources.pages import generate_pages_batch
from t_digest_ray.stages.extract import ExtractText

CASES = [
    b"<html><p>hello world</p></html>",
    None,
    b"no tags",
    b"<p></p>",
    b"</p><p>",            # close before open -> empty
    b"<p>a</p>mid</p>",    # multiple closes -> last one wins
    b"x<p>unclosed",
    b"closed</p>x",
    "<p>café 中文</p>".encode(),
    b"",
    b"<p>" + b"z" * 5000 + b"</p>",
    b"<p>tail</p></body></html>",
]


def _fast(ex: ExtractText, values) -> list[str]:
    t = pa.table({"html": pa.array(values, type=pa.binary())})
    return ex(t)["extracted_text"].to_pylist()


def test_fast_matches_slow_on_adversarial_cases():
    ex = ExtractText()
    assert _fast(ex, CASES) == ex._extract_slow(CASES).to_pylist()


def test_fast_matches_slow_on_chunked_and_sliced():
    ex = ExtractText()
    chunked = pa.chunked_array([
        pa.array(CASES[:5], type=pa.binary()),
        pa.array(CASES[5:], type=pa.binary()),
    ])
    out = ex(pa.table({"html": chunked}))["extracted_text"].to_pylist()
    assert out == ex._extract_slow(CASES).to_pylist()

    sliced = pa.table({"html": pa.array(CASES, type=pa.binary()).slice(2, 7)})
    assert (ex(sliced)["extracted_text"].to_pylist()
            == ex._extract_slow(CASES[2:9]).to_pylist())


def test_invalid_utf8_falls_back():
    ex = ExtractText()
    out = _fast(ex, [b"<p>\xff\xfe</p>", b"<p>ok</p>"])
    assert out == ["��", "ok"]


def test_empty_batch():
    ex = ExtractText()
    assert _fast(ex, []) == []


def test_generated_pages_roundtrip():
    """north_star per-row invariant: extraction inverts the html template."""
    ex = ExtractText()
    t = generate_pages_batch(np.arange(5000, dtype=np.uint64))
    out = ex(t)
    assert out["extracted_text"].to_pylist() == out["text"].to_pylist()
