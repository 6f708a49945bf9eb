"""Webtext payload stages: html -> text extraction and numeric derivations.

``ExtractText`` is the per-row-deterministic extractor required by the
north_star invariant: re-running at any parallelism yields byte-identical
``text`` per ``url``. It is a callable class (actor-pool stage) so the
delimiter search tables are built once per actor, per the stateful-stage
pattern; the per-batch body is a C-speed ``bytes.find`` scan (no Python
regex per row in the common path).

``derive_metrics`` adds the numeric columns the sketches consume —
``text_length`` (utf8 chars), ``html_size`` (bytes), ``host`` (url authority)
— with pyarrow.compute kernels only (zero-copy Arrow in/out).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OPEN = b"<p>"
_CLOSE = b"</p>"


class ExtractText:
    """html(binary) -> extracted_text(string), deterministic per row.

    Extraction rule: the payload between the first ``<p>`` and the last
    ``</p>`` (our html template wraps the entire text in a single <p> block;
    on malformed input the rule degrades to empty string, never raises).
    """

    def __init__(self, html_col: str = "html",
                 out_col: str = "extracted_text"):
        self.html_col = html_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch[self.html_col].to_pylist()
        out = []
        for h in htmls:
            if h is None:
                out.append("")
                continue
            s = h.find(_OPEN)
            e = h.rfind(_CLOSE)
            if s < 0 or e < 0 or e <= s:
                out.append("")
            else:
                out.append(h[s + len(_OPEN):e].decode("utf-8", "replace"))
        return batch.append_column(self.out_col,
                                   pa.array(out, type=pa.string()))


def derive_metrics(batch: pa.Table, text_col: str = "text",
                   html_col: str = "html",
                   url_col: str = "url") -> pa.Table:
    """Vectorized derivations (SURVEY.md §2.4): text_length, html_size, host."""
    cols = {}
    if text_col in batch.column_names:
        cols["text_length"] = pc.cast(
            pc.utf8_length(batch[text_col]), pa.float64())
    if html_col in batch.column_names:
        cols["html_size"] = pc.cast(
            pc.binary_length(batch[html_col]), pa.float64())
    if url_col in batch.column_names:
        # host = substring between "://" and the next "/"
        stripped = pc.replace_substring_regex(
            batch[url_col], r"^[a-z]+://", "")
        cols["host"] = pc.replace_substring_regex(
            stripped, r"/.*$", "")
    for name, arr in cols.items():
        batch = batch.append_column(name, arr)
    return batch


def check_extraction(batch: pa.Table, text_col: str = "text",
                     extracted_col: str = "extracted_text") -> pa.Table:
    """Append a per-row boolean: extracted text byte-identical to stored."""
    eq = pc.equal(batch[text_col], batch[extracted_col])
    return batch.append_column("extraction_ok", eq)
