"""Deterministic ``web_pages`` table (the BASELINE.json input_hint shape).

Derives the Common-Crawl-style input table
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
from the driver-generated ``documents.parquet``
``(doc_id, text, lang, source, n_chars)`` — byte-identical per url across
runs (the per-row invariant), no external data. Derivation (FIXTURES.md §1):

    url     = 'https://site{doc_id % 997}.example/{doc_id:08d}'
    warc_ts = 2025-01-01T00:00:00 + doc_id seconds (UTC-naive, us precision)
    html    = b'<html><body>' + utf8(text) + b'</body></html>'
    text    = documents.text        (the indexed content, carried unchanged —
                                     we never re-extract from html; reference
                                     analogue: HTMLStripCharFilter exists but
                                     our text column is already extracted)
    lang    = documents.lang

``WEB_PAGES_SQL`` expresses the same derivation for the DuckDB oracle. The
zero-padded url makes lexicographic url order equal numeric doc_id order, so
``doc_id`` doubles as the deterministic global docID (SURVEY.md §1.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

EPOCH_2025 = np.datetime64("2025-01-01T00:00:00", "us")

# DuckDB view body producing the same table (keep in lockstep with the code).
WEB_PAGES_SQL = """
SELECT
  'https://site' || (doc_id % 997) || '.example/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
  TIMESTAMP '2025-01-01 00:00:00' + to_microseconds(doc_id * 1000000) AS warc_ts,
  CAST('<html><body>' || text || '</body></html>' AS BLOB) AS html,
  text,
  lang,
  doc_id
FROM documents
""".strip()


def derive_batch(batch: pa.Table, *, include_html: bool = True) -> pa.Table:
    doc_id = batch.column("doc_id").to_numpy()
    text = batch.column("text")
    urls = pa.array(
        [f"https://site{d % 997}.example/{d:08d}" for d in doc_id], pa.string()
    )
    ts = pa.array(EPOCH_2025 + doc_id.astype("timedelta64[s]").astype("timedelta64[us]"))
    cols = {"url": urls, "warc_ts": ts}
    if include_html:
        cols["html"] = pc.binary_join_element_wise(
            pa.array([b"<html><body>"] * len(batch), pa.binary()),
            text.combine_chunks().cast(pa.binary()),
            pa.array([b"</body></html>"] * len(batch), pa.binary()),
            pa.scalar(b"", pa.binary()),
        )
    cols["text"] = text
    cols["lang"] = batch.column("lang")
    cols["doc_id"] = batch.column("doc_id")
    return pa.table(cols)


def load_web_pages(sf_dir: str, *, include_html: bool = True) -> "ray.data.Dataset":
    """Ray Dataset of web_pages derived from ``{sf_dir}/documents.parquet``.

    ``include_html=False`` never materialises the wide binary column — the
    indexing pipeline doesn't read it (SURVEY.md §7.5 'wide rows')."""
    ds = ray.data.read_parquet(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(
        derive_batch, batch_format="pyarrow", fn_kwargs={"include_html": include_html}
    )


# ---------------------------------------------------------------------------
# HTML text extraction (HTMLStripCharFilter analogue)
# ---------------------------------------------------------------------------

import html as _html
import re as _re

_TAG_RE = _re.compile(rb"<[^>]*>")


def extract_text_batch(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """binary html -> extracted text: tag strip + entity decode (reference:
    analysis/common/.../charfilter/HTMLStripCharFilter.java — the
    generated char filter removes markup and resolves entities; this is
    the regex-scale subset sufficient for body-wrapped content). The
    extraction is the PER-ROW INVARIANT of the input hint: over the
    synthetic web_pages derivation it must reproduce the text column
    byte-identically per url (asserted by the html_extract oracle
    entry)."""
    blobs = batch.column(html_col).to_pylist()
    out = [
        _html.unescape(
            _TAG_RE.sub(b"", bytes(b or b"")).decode("utf-8", "replace")
        )
        for b in blobs
    ]
    cols = {
        name: batch.column(name)
        for name in batch.schema.names
        if name != html_col  # drop the wide column immediately
    }
    cols["text_extracted"] = pa.array(out, pa.string())
    return pa.table(cols)


def extract_text(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Streaming extraction stage over a web_pages-shaped Dataset (small
    batches — the html payload dominates block memory)."""
    return ds.map_batches(
        extract_text_batch, batch_format="pyarrow", batch_size=256
    )
