"""The Common-Crawl-style ``pages`` table (BASELINE.json input_hint).

Schema: ``url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string``.

Two deterministic constructors:

* ``synthetic_pages(n_rows)`` — fully synthetic, generated per-row from the
  row id by counter-based hashing (``splitmix64``), so every cell is a pure
  function of (seed, row_id): identical bytes at ANY parallelism, block size
  or retry order (the per-row determinism invariant, SURVEY.md §4 /
  FIXTURES.md §1). Hot-key skew is built in: ``lang`` is Zipf over 20 codes
  with "en" ~ 40%, hosts are Zipf over 1000.
* ``pages_from_documents(sf_dir)`` — deterministic reshaping of the driver's
  ``documents.parquet`` into the pages schema (url from doc_id+source, html
  wraps text in a fixed template), so correctness checks can run against
  DuckDB over the same testdata.

The html template makes extraction exactly invertible:
``<html><head><title>{url}</title></head><body><p>{text}</p></body></html>``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64, splitmix64, uniform01

SEED = 42
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

LANGS = ["en", "de", "fr", "es", "ru", "zh", "ja", "pt", "it", "nl",
         "pl", "tr", "sv", "ar", "ko", "cs", "fi", "hu", "el", "da"]
N_HOSTS = 1000

# per-lang lognormal text-length parameters (mu in log-chars) — lengths
# differ measurably per lang so per-lang quantile results are distinct
_LANG_MU = 5.0 + 0.12 * np.arange(len(LANGS))
_LANG_SIGMA = 0.55 + 0.01 * np.arange(len(LANGS))

_HTML_PRE = "<html><head><title>"
_HTML_MID = "</title></head><body><p>"
_HTML_POST = "</p></body></html>"


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return np.cumsum(w) / w.sum()

_LANG_CDF = _zipf_cdf(len(LANGS), 1.35)   # lang[0]="en" gets ~40%
_HOST_CDF = _zipf_cdf(N_HOSTS, 1.1)


def _corpus() -> str:
    """1 MiB deterministic token soup, built once per process."""
    global _CORPUS
    try:
        return _CORPUS
    except NameError:
        pass
    rng = np.random.default_rng(SEED)
    vocab = np.array([f"w{i:03x}" for i in range(4096)])
    toks = vocab[rng.integers(0, len(vocab), 220_000)]
    _CORPUS = " ".join(toks.tolist())
    return _CORPUS


def _corpus_bytes() -> np.ndarray:
    """The corpus as a uint8 array (built once per process)."""
    global _CORPUS_B
    try:
        return _CORPUS_B
    except NameError:
        _CORPUS_B = np.frombuffer(_corpus().encode(), dtype=np.uint8)
        return _CORPUS_B


_HEXDIGITS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
_URL_PRE = np.frombuffer(b"https://host", dtype=np.uint8)
_URL_MID = np.frombuffer(b".example.com/p/", dtype=np.uint8)


def _format_urls(host_idx: np.ndarray, ids: np.ndarray) -> pa.Array:
    """Vectorized 'https://host%04d.example.com/p/%016x' (fixed 47 chars):
    one uint8 char matrix, digits computed arithmetically — no per-row
    Python string formatting."""
    n = len(ids)
    width = len(_URL_PRE) + 4 + len(_URL_MID) + 16
    out = np.empty((n, width), dtype=np.uint8)
    out[:, :len(_URL_PRE)] = _URL_PRE
    hi = host_idx.astype(np.int64)
    for d in range(4):
        out[:, len(_URL_PRE) + d] = (hi // 10 ** (3 - d)) % 10 + 48
    mid0 = len(_URL_PRE) + 4
    out[:, mid0:mid0 + len(_URL_MID)] = _URL_MID
    base = mid0 + len(_URL_MID)
    iv = ids.astype(np.uint64)
    for d in range(16):
        nib = ((iv >> np.uint64(4 * (15 - d))) & np.uint64(15)).astype(np.int64)
        out[:, base + d] = _HEXDIGITS[nib]
    # int32 offsets overflow past 2 GiB of buffer — at 47 B/url that is
    # ~45 M rows in ONE batch, which should never happen (blocks are far
    # smaller); fail loudly rather than silently wrap
    assert n * width < 2**31, "url batch exceeds int32 string offsets"
    offsets = (np.arange(n + 1, dtype=np.int64) * width).astype(np.int32)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(out.reshape(-1)))


def _slice_corpus(offs: np.ndarray, length: np.ndarray) -> pa.Array:
    """Vectorized corpus[o:o+l] per row: one fancy-indexed gather into a
    single Arrow string buffer (corpus is pure ASCII)."""
    corpus_b = _corpus_bytes()
    cum = np.cumsum(length, dtype=np.int64)
    starts_out = cum - length
    idx = (np.arange(cum[-1] if len(cum) else 0, dtype=np.int64)
           - np.repeat(starts_out, length) + np.repeat(offs, length))
    data = corpus_b[idx]
    total = int(cum[-1]) if len(cum) else 0
    if total >= 2**31:
        # one huge low-parallelism batch: fall back to large_string with
        # int64 offsets instead of silently wrapping into int32
        offsets64 = np.empty(len(offs) + 1, dtype=np.int64)
        offsets64[0] = 0
        offsets64[1:] = cum
        return pa.LargeStringArray.from_buffers(
            len(offs), pa.py_buffer(offsets64.tobytes()), pa.py_buffer(data))
    offsets = np.empty(len(offs) + 1, dtype=np.int32)
    offsets[0] = 0
    offsets[1:] = cum
    return pa.StringArray.from_buffers(
        len(offs), pa.py_buffer(offsets.tobytes()), pa.py_buffer(data))


def generate_pages_batch(ids: np.ndarray) -> pa.Table:
    """Vectorized pages rows for the given global row ids (deterministic)."""
    import pyarrow.compute as pc

    ids = np.asarray(ids, dtype=np.uint64)
    h_host = splitmix64(ids ^ np.uint64(0x686F7374))  # 'host'
    h_lang = splitmix64(ids ^ np.uint64(0x6C616E67))  # 'lang'
    h_len = splitmix64(ids ^ np.uint64(0x6C656E31))
    h_len2 = splitmix64(ids ^ np.uint64(0x6C656E32))
    h_off = splitmix64(ids ^ np.uint64(0x6F666673))

    host_idx = np.searchsorted(_HOST_CDF, uniform01(h_host), side="left")
    lang_idx = np.searchsorted(_LANG_CDF, uniform01(h_lang), side="left")
    langs = np.asarray(LANGS, dtype=object)[lang_idx]

    # Box-Muller normal from two uniform hashes -> per-lang lognormal length
    u1 = np.clip(uniform01(h_len), 1e-12, 1.0)
    u2 = uniform01(h_len2)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    length = np.exp(_LANG_MU[lang_idx] + _LANG_SIGMA[lang_idx] * z)
    length = np.clip(length, 16, 4096).astype(np.int64)

    corpus = _corpus()
    max_off = len(corpus) - 4096 - 1
    offs = (h_off % np.uint64(max_off)).astype(np.int64)

    urls = _format_urls(host_idx, ids)
    texts = _slice_corpus(offs, length)
    # html = pre + url + mid + text + post, joined by the C kernel; cast to
    # binary is exact because every component is ASCII
    html_str = pc.binary_join_element_wise(
        pa.scalar(_HTML_PRE), urls, pa.scalar(_HTML_MID), texts,
        pa.scalar(_HTML_POST), "")
    htmls = pc.cast(html_str, pa.binary())
    ts = (BASE_TS_US + ids.astype(np.int64) * 1_000_000)

    return pa.table({
        "url": urls,
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "html": htmls,
        "text": texts,
        "lang": pa.array(langs, type=pa.string()),
    })


def synthetic_pages(n_rows: int, parallelism: int = -1,
                    chunk_size: int = 4096):
    """A lazy Ray Dataset of deterministic pages rows.

    Generation runs in ``chunk_size``-row slices inside each task, so the
    string-building buffers stay a few MB (cache-resident, recycled by
    the allocator); the emitted block has chunked columns — zero-copy
    concatenation, no full-block rebuild."""
    import ray.data as rd

    ds = rd.range(n_rows, override_num_blocks=parallelism
                  if parallelism > 0 else None)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        tables = [generate_pages_batch(ids[off:off + chunk_size])
                  for off in range(0, len(ids), chunk_size)]
        return pa.concat_tables(tables)

    return ds.map_batches(gen, batch_format="pyarrow")


def pages_from_documents(sf_dir: str):
    """Reshape the driver's documents table into the pages schema."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])

    def to_pages(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        doc_id = batch["doc_id"].to_numpy()
        # vectorized 'https://{source}.example.com/doc/{id:012d}' (C
        # kernels; matches the f-string formatting for non-negative ids)
        id_str = pc.utf8_lpad(pc.cast(batch["doc_id"], pa.string()),
                              12, "0")
        urls = pc.binary_join_element_wise(
            pa.scalar("https://"), batch["source"],
            pa.scalar(".example.com/doc/"), id_str, "")
        htmls = pc.cast(pc.binary_join_element_wise(
            pa.scalar(_HTML_PRE), urls, pa.scalar(_HTML_MID),
            batch["text"], pa.scalar(_HTML_POST), ""), pa.binary())
        ts = BASE_TS_US + doc_id * 1_000_000
        return pa.table({
            "url": urls,
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": htmls,
            "text": batch["text"],
            "lang": batch["lang"],
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")
