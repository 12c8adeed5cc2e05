"""Text-analysis operators for large-scale training-data pipelines.

Per-document statistics computed in one ``map_batches`` pass over the
``documents`` table: token counting, quality scoring (length / stopword
ratios), n-gram-heuristic language ID, and content fingerprinting. Every
formula here is deliberately expressible in ANSI SQL so the DuckDB oracle can
verify it hash-exactly (see __ray_entry__.oracle_sql).

Scale notes: the stage is stateless and embarrassingly parallel — one regex
pass per document, no shuffle; at 100 TB this runs as a pure streaming
``map_batches`` with whatever concurrency the cluster has. The md5
fingerprint doubles as the exact-dedup key (pipelines/dedup.py).
"""

from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pyarrow as pa

import ray.data

# Tokenizer shared with the SQL-parity analyzer (functions/analysis.py):
# lower(text) then [a-z0-9]+ runs == regexp_extract_all in DuckDB.
_TOKEN_RE = re.compile(r"[a-z0-9]+")

from ..functions.analysis import ENGLISH_STOP_WORDS
from ..functions.rounding import round_half_away

#: langid heuristic: >= this many stopword tokens => "en"
LANGID_MIN_STOP_TOKENS = 2
#: quality = min(n_tokens, QUALITY_LEN_CAP)/QUALITY_LEN_CAP * (1 - stop_ratio)
QUALITY_LEN_CAP = 200


def doc_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> full per-doc stats row (one regex pass per doc)."""
    doc_ids = batch.column("doc_id").to_numpy()
    texts: List[str] = batch.column("text").to_pylist()
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    n_tokens = np.empty(n, dtype=np.int64)
    n_stop = np.empty(n, dtype=np.int64)
    tok_chars = np.empty(n, dtype=np.int64)
    fps: List[str] = []
    stop = ENGLISH_STOP_WORDS
    for i, text in enumerate(texts):
        text = text or ""
        toks = _TOKEN_RE.findall(text.lower())
        n_chars[i] = len(text)
        n_tokens[i] = len(toks)
        n_stop[i] = sum(1 for t in toks if t in stop)
        tok_chars[i] = sum(len(t) for t in toks)
        fps.append(hashlib.md5(text.encode("utf-8")).hexdigest())
    nt = np.maximum(n_tokens, 1).astype(np.float64)
    stop_ratio = n_stop / nt
    alpha_ratio = tok_chars / np.maximum(n_chars, 1).astype(np.float64)
    mean_tok_len = tok_chars / nt
    quality = (
        np.minimum(n_tokens, QUALITY_LEN_CAP) / float(QUALITY_LEN_CAP)
    ) * (1.0 - stop_ratio)
    lang_pred = np.where(n_stop >= LANGID_MIN_STOP_TOKENS, "en", "und")
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "n_chars": pa.array(n_chars),
            "n_tokens": pa.array(n_tokens),
            "n_stop": pa.array(n_stop),
            "stop_ratio": pa.array(round_half_away(stop_ratio, 4)),
            "alpha_ratio": pa.array(round_half_away(alpha_ratio, 4)),
            "mean_token_len": pa.array(round_half_away(mean_tok_len, 4)),
            "quality": pa.array(round_half_away(quality, 4)),
            "lang_pred": pa.array(lang_pred.tolist(), pa.string()),
            "fingerprint": pa.array(fps, pa.string()),
        }
    )


def doc_stats(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.select_columns(["doc_id", "text"]).map_batches(
        doc_stats_batch, batch_format="pyarrow"
    )


def token_counts(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return doc_stats(ds).select_columns(
        ["doc_id", "n_tokens", "n_chars", "mean_token_len"]
    )


def quality_scores(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return doc_stats(ds).select_columns(
        ["doc_id", "stop_ratio", "alpha_ratio", "quality"]
    )


def langid(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return doc_stats(ds).select_columns(["doc_id", "lang_pred"])


def fingerprints(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return doc_stats(ds).select_columns(["doc_id", "fingerprint"])
