"""URL canonicalization — the crawl-dedup normalizer.

Web corpora carry the same page under many spellings: uppercase scheme
or host, an explicit default port, a ``www.`` prefix, tracking query
params (``utm_*``), fragments, and trailing slashes. Canonicalizing
before dedup is standard crawl hygiene (the same class of normalize
rules every CDX/WARC toolchain applies).

The contract here is a FIXED SEQUENCE of RE2 rewrites so the transform
is engine-portable: pyarrow's ``replace_substring_regex`` /
``extract_regex`` and DuckDB's ``regexp_replace(..., 'g')`` /
``regexp_extract`` are both RE2, so the SQL oracle replays the exact
same canonical strings byte-for-byte:

    1. drop the fragment:              ``#.*$``        -> ''
    2. split head ``scheme://host`` from the rest:
       ``^([A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*)(.*)$``
    3. head: lowercase; ``://www\\.`` -> ``://``; strip ``:80$``
    4. rest: ``/\\?`` -> ``?``; strip tracking params
       ``[?&]utm_[^&]*`` -> '' (global); ``^([^?&]*)&`` -> ``\\1?``;
       strip a trailing ``/``
    5. canonical = head || rest
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_HEAD_REST = r"^(?P<head>[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)(?P<rest>.*)$"


def canonicalize_urls(arr) -> pa.Array:
    """Vectorized URL canonicalization (see module contract). Input may
    be a pa.Array/ChunkedArray of strings; returns a string Array of the
    same length. URLs that do not match ``scheme://host`` pass through
    the fragment/rest rules with an empty head (null-safe)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pc.replace_substring_regex(arr, r"#.*$", "")
    parts = pc.extract_regex(s, _HEAD_REST)
    head = pc.struct_field(parts, "head")
    rest = pc.struct_field(parts, "rest")
    head = pc.utf8_lower(head)
    head = pc.replace_substring_regex(head, r"://www\.", "://")
    head = pc.replace_substring_regex(head, r":80$", "")
    rest = pc.replace_substring_regex(rest, r"/\?", "?")
    rest = pc.replace_substring_regex(rest, r"[?&]utm_[^&]*", "")
    # if the first surviving separator is '&' (the '?' param was a
    # dropped tracker), it becomes the new '?' — anchored, so at most
    # one rewrite in both engines
    rest = pc.replace_substring_regex(rest, r"^([^?&]*)&", r"\1?")
    rest = pc.replace_substring_regex(rest, r"/$", "")
    out = pc.binary_join_element_wise(head, rest, "")
    # non-matching inputs (no scheme://host): fall back to the
    # fragment-stripped string so the op is total
    return pc.if_else(pc.is_null(out), s, out)


def url_host(arr) -> pa.Array:
    """Host part of an already-canonical URL (text after ``://``)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.replace_substring_regex(arr, r"^[a-z]+://([^/?#]*).*$",
                                      r"\1")


def messy_urls_from_ids(ids) -> pa.Array:
    """Deterministic 'crawl spelling' fixture: one messy URL per int id,
    with planted canonical collisions. Three variants by id % 3 — a
    trailing-slash spelling, a leading-utm spelling, and a
    trailing-utm + fragment spelling; ids that agree mod 7 (host) and
    mod 5 (path) collide after canonicalization across variants 1/2
    (same ?id=) and within variant 0. The SQL oracle rebuilds the same
    strings from doc_id, so the whole pipeline is value-checked."""
    import numpy as np
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    iv = (ids.to_numpy(zero_copy_only=False)
          if isinstance(ids, pa.Array)
          else np.asarray(ids)).astype(np.int64)
    n = len(iv)

    def s(x) -> pa.Array:
        return pc.cast(pa.array(x), pa.string())

    h = s(iv % 7)
    g = s(iv % 5)
    m = s(iv % 4)
    base = pc.binary_join_element_wise(
        pa.array(["HTTPS://WWW.Site"] * n), h,
        pa.array([".COM:80/a/"] * n), g, "")
    v0 = pc.binary_join_element_wise(base, pa.array(["/"] * n), "")
    v1 = pc.binary_join_element_wise(
        base, pa.array(["/?utm_source=feed&id="] * n), m, "")
    v2 = pc.binary_join_element_wise(
        base, pa.array(["?id="] * n), m,
        pa.array(["&utm_campaign=x#top"] * n), "")
    var = pa.array(iv % 3)
    return pc.if_else(pc.equal(var, 0), v0,
                      pc.if_else(pc.equal(var, 1), v1, v2))
