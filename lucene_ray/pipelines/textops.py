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


# ---------------------------------------------------------------------------
# Corpus-trained character-trigram LM quality score (perplexity proxy)
# ---------------------------------------------------------------------------

#: add-one smoothing vocabulary: the trigram alphabet is [a-z0-9 ] = 37
#: symbols, so V = 37^3 possible trigrams
_LM_ALPHABET = 50653  # 37 ** 3


def _doc_trigrams(text: str) -> List[str]:
    """Character trigrams over the normalized text (lowercase, token runs
    joined by single spaces — the SQL-parity normalization)."""
    norm = " ".join(_TOKEN_RE.findall(text.lower()))
    return [norm[i : i + 3] for i in range(len(norm) - 2)]


def train_trigram_lm(ds: "ray.data.Dataset"):
    """Corpus trigram counts -> (counts dict, total) — the LM "training"
    pass. Distributed shape: per-batch partial counts (pre-aggregated
    inside the batch), one groupby(trigram).sum over a bounded key space
    (<= 37^3 distinct trigrams regardless of corpus size), then the tiny
    model table leaves the plan (it is broadcast back for scoring).
    """

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: "Counter[str]" = Counter()
        for t in batch.column("text").to_pylist():
            c.update(_doc_trigrams(t))
        if not c:
            return pa.table(
                {"tri": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        ks, vs = zip(*sorted(c.items()))
        return pa.table(
            {"tri": pa.array(ks, pa.string()),
             "cnt": pa.array(vs, pa.int64())}
        )

    import ray.data as rd

    agg = (
        ds.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("tri")
        .aggregate(rd.aggregate.Sum("cnt", alias_name="count"))
        .take_all()
    )
    counts = {r["tri"]: int(r["count"]) for r in agg}
    return counts, sum(counts.values())


def lm_quality_scores(
    ds: "ray.data.Dataset", ndigits: int = 6
) -> "ray.data.Dataset":
    """CCNet-style LM quality filter signal: per-doc mean log-probability
    of its character trigrams under the corpus-trained add-one-smoothed
    trigram model — low scores flag boilerplate/garbage relative to the
    corpus. -> Dataset(doc_id, lm_logprob) (docs with < 1 trigram get
    score 0).

    Scale: training is one bounded groupby (model <= 37^3 rows); the
    model is ``ray.put`` once and every scoring batch reads it from the
    object store — broadcast, not re-shipped per batch.
    """
    import ray
    import ray.data  # noqa: F401

    counts, total = train_trigram_lm(ds)
    denom = float(total + _LM_ALPHABET)
    # dense log-prob table indexed by trigram id (37^3 float64 = 400 KB);
    # broadcast ONCE via the object store, zero-copy into every task
    logp = np.full(_LM_ALPHABET, np.log(1.0 / denom), dtype=np.float64)
    for tri, c in counts.items():
        logp[_tri_id(tri)] = np.log((c + 1) / denom)
    logp_ref = ray.put(logp)

    def score(batch: pa.Table) -> pa.Table:
        table = ray.get(logp_ref)
        ids = batch.column("doc_id")
        out = np.zeros(len(batch), dtype=np.float64)
        for i, t in enumerate(batch.column("text").to_pylist()):
            tids = _tri_ids(t)
            if len(tids):
                out[i] = float(table[tids].sum()) / len(tids)
        return pa.table(
            {
                "doc_id": ids,
                "lm_logprob": pa.array(
                    round_half_away(out, ndigits), pa.float64()
                ),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def _char_codes(norm: str) -> np.ndarray:
    """Normalized chars -> symbol codes: 'a'-'z' -> 0..25, '0'-'9' ->
    26..35, ' ' -> 36 (inputs are guaranteed normalized)."""
    a = np.frombuffer(norm.encode("ascii"), dtype=np.uint8).astype(np.int64)
    codes = np.where(
        a == 32, 36, np.where(a >= 97, a - 97, a - 48 + 26)
    )
    return codes


def _tri_id(tri: str) -> int:
    c = _char_codes(tri)
    return int(c[0] * 1369 + c[1] * 37 + c[2])


def _tri_ids(text: str) -> np.ndarray:
    """All trigram ids of a document, vectorized (one encode + two
    shifted adds per doc — no per-trigram Python)."""
    norm = " ".join(_TOKEN_RE.findall(text.lower()))
    if len(norm) < 3:
        return np.empty(0, dtype=np.int64)
    c = _char_codes(norm)
    return c[:-2] * 1369 + c[1:-1] * 37 + c[2:]


# ---------------------------------------------------------------------------
# URL parsing + host-level aggregation (web-corpus bookkeeping)
# ---------------------------------------------------------------------------

_URL_RE = re.compile(r"^([a-z][a-z0-9+.-]*)://([^/]+)(/.*)?$")


def parse_urls(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, url) -> (doc_id, scheme, host, path) — vectorized regex
    split, streaming (the canonicalization step every crawl pipeline runs
    before host-level policies). Unparseable urls get empty strings."""

    def split(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        schemes, hosts, paths = [], [], []
        for u in urls:
            m = _URL_RE.match(u.lower()) if u else None
            if m is None:
                schemes.append("")
                hosts.append("")
                paths.append("")
            else:
                schemes.append(m.group(1))
                hosts.append(m.group(2))
                paths.append(m.group(3) or "/")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "scheme": pa.array(schemes, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "path": pa.array(paths, pa.string()),
            }
        )

    return ds.select_columns(["doc_id", "url"]).map_batches(
        split, batch_format="pyarrow"
    )


def host_stats(web_pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-host page count and total text chars — the host-level rollup
    that feeds domain capping / blocklists. Partial counts inside every
    batch, tiny groupby(host) finish (hosts << pages).
    -> Dataset(host, n_pages, total_chars)."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        agg: dict = {}
        for u, t in zip(urls, texts):
            m = _URL_RE.match(u.lower()) if u else None
            host = m.group(2) if m else ""
            c, n = agg.get(host, (0, 0))
            agg[host] = (c + 1, n + len(t))
        hosts = sorted(agg)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "pages_part": pa.array(
                    [agg[h][0] for h in hosts], pa.int64()
                ),
                "chars_part": pa.array(
                    [agg[h][1] for h in hosts], pa.int64()
                ),
            }
        )

    return (
        web_pages.select_columns(["url", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            rd.aggregate.Sum("pages_part", alias_name="n_pages"),
            rd.aggregate.Sum("chars_part", alias_name="total_chars"),
        )
    )


def repetition_stats(ds: "ray.data.Dataset", ndigits: int = 6):
    """Gopher-rule repetition signals (Rae et al. 2021 quality filters,
    public): per-doc word-bigram/trigram repetition ratios used to drop
    boilerplate and keyword-stuffed pages. One streaming pass, stateless.

    -> Dataset(doc_id, dup_bigram_frac, top_bigram_frac, rep_trigram_frac)

    * dup_bigram_frac  = 1 - distinct_bigrams / total_bigrams
    * top_bigram_frac  = count of the most frequent bigram / total_bigrams
      (ties by the bigram's text order are irrelevant — only the max
      count matters)
    * rep_trigram_frac = fraction of trigram OCCURRENCES whose trigram
      appears more than once in the doc

    Docs with < 2 tokens emit 0.0 for all three (no bigrams; SQL mirrors
    via the same guard).
    """
    from collections import Counter

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        texts = batch.column("text").to_pylist()
        n = len(texts)
        dup2 = np.zeros(n, dtype=np.float64)
        top2 = np.zeros(n, dtype=np.float64)
        rep3 = np.zeros(n, dtype=np.float64)
        for i, t in enumerate(texts):
            toks = _TOKEN_RE.findall((t or "").lower())
            if len(toks) >= 2:
                bi = Counter(zip(toks[:-1], toks[1:]))
                total = len(toks) - 1
                dup2[i] = 1.0 - len(bi) / total
                top2[i] = max(bi.values()) / total
            if len(toks) >= 3:
                tri = Counter(zip(toks[:-2], toks[1:-1], toks[2:]))
                total3 = len(toks) - 2
                rep3[i] = (
                    sum(c for c in tri.values() if c > 1) / total3
                )
        return pa.table(
            {
                "doc_id": ids,
                "dup_bigram_frac": pa.array(
                    round_half_away(dup2, ndigits), pa.float64()
                ),
                "top_bigram_frac": pa.array(
                    round_half_away(top2, ndigits), pa.float64()
                ),
                "rep_trigram_frac": pa.array(
                    round_half_away(rep3, ndigits), pa.float64()
                ),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap against an eval set)
# ---------------------------------------------------------------------------


def decontaminate(
    ds: "ray.data.Dataset",
    benchmark_ds: "ray.data.Dataset",
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Flag training documents sharing any ``n``-gram (raw ``[a-z0-9]+``
    token shingles over lower(text) — the SQL-parity tokenization) with a
    benchmark/eval corpus -> Dataset(doc_id, n_hits) with one row per
    CONTAMINATED doc, n_hits = count of DISTINCT overlapping n-grams.
    Filter-join ``ds`` against this to drop them (the standard eval-
    decontamination step of an LLM training pipeline).

    Scale shape: the benchmark side is an EVAL SET — small by definition —
    so its n-gram set is gathered once on the driver (bounded by benchmark
    size, not corpus size) and broadcast via ``ray.put``; the corpus side
    streams through one stateless ``map_batches``, no shuffle. At 100 TB
    the broadcast would hold 64-bit n-gram hashes instead of strings
    (collision-tolerable for a filter); strings are kept here so the
    DuckDB oracle is exact.
    """
    bench: set = set()
    for batch in benchmark_ds.select_columns([text_col]).iter_batches(
        batch_format="pyarrow", batch_size=4096
    ):
        for txt in batch.column(text_col).to_pylist():
            toks = _TOKEN_RE.findall((txt or "").lower())
            bench.update(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
    import ray

    ref = ray.put(bench)

    def check(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bset = _ray.get(ref)
        out_ids: List[int] = []
        out_hits: List[int] = []
        for did, txt in zip(
            batch.column(id_col).to_pylist(),
            batch.column(text_col).to_pylist(),
        ):
            toks = _TOKEN_RE.findall((txt or "").lower())
            grams = {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }
            h = len(grams & bset)
            if h:
                out_ids.append(did)
                out_hits.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_hits": pa.array(out_hits, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        check, batch_format="pyarrow"
    )


def decontaminate_fuzzy(
    ds: "ray.data.Dataset",
    benchmark_ds: "ray.data.Dataset",
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Doc-level FUZZY eval decontamination: flag training documents whose
    k-shingle Jaccard similarity to some benchmark/eval document is
    >= ``threshold`` (near-duplicate contamination the n-gram-hit
    :func:`decontaminate` undercounts when the wording drifts). ->
    Dataset(doc_id, bench_id, jaccard), self-pairs excluded, threshold
    applied to the UNROUNDED similarity, output rounded to 4.

    Scale shape: the eval side is small by definition, so its per-doc
    shingle sets are gathered once on the driver and broadcast as an
    inverted shingle -> bench-row map (bounded by eval-suite size); the
    corpus streams through ONE stateless map_batches computing EXACT
    per-bench intersections — no shuffle. The dedup stack's MinHash/LSH
    banding (pipelines/dedup.py) exists to avoid the corpus x corpus
    all-pairs blowup; against a broadcast-resident eval set the candidate
    set per doc is already bounded, so banding would only trade the exact
    answer for an approximate one at the same cost shape — exactness is
    kept (and makes the DuckDB oracle hash-exact)."""
    from .dedup import shingle_strings

    import ray

    bench_ids: List[int] = []
    bench_sizes: List[int] = []
    inv: dict = {}
    for batch in benchmark_ds.select_columns([id_col, text_col]).iter_batches(
        batch_format="pyarrow", batch_size=4096
    ):
        for bid, txt in zip(
            batch.column(id_col).to_pylist(),
            batch.column(text_col).to_pylist(),
        ):
            sh = set(shingle_strings(txt or "", k))
            if not sh:
                continue
            idx = len(bench_ids)
            bench_ids.append(int(bid))
            bench_sizes.append(len(sh))
            for s in sh:
                inv.setdefault(s, []).append(idx)
    ref = ray.put((inv, np.asarray(bench_ids, dtype=np.int64),
                   np.asarray(bench_sizes, dtype=np.int64)))

    def check(batch: pa.Table) -> pa.Table:
        import ray as _ray

        binv, bids, bsizes = _ray.get(ref)
        out_doc: List[int] = []
        out_bench: List[int] = []
        out_j: List[float] = []
        for did, txt in zip(
            batch.column(id_col).to_pylist(),
            batch.column(text_col).to_pylist(),
        ):
            sh = set(shingle_strings(txt or "", k))
            if not sh:
                continue
            counts: dict = {}
            for s in sh:
                for idx in binv.get(s, ()):
                    counts[idx] = counts.get(idx, 0) + 1
            for idx, icnt in counts.items():
                bid = int(bids[idx])
                if bid == did:
                    continue
                j = icnt / (len(sh) + int(bsizes[idx]) - icnt)
                if j >= threshold:
                    out_doc.append(did)
                    out_bench.append(bid)
                    out_j.append(j)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "bench_id": pa.array(out_bench, pa.int64()),
                "jaccard": pa.array(
                    round_half_away(np.asarray(out_j, dtype=np.float64), 4),
                    pa.float64(),
                ),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        check, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction)
# ---------------------------------------------------------------------------

# Deliberately lookaround-free patterns so python re and RE2-style engines
# (DuckDB regexp_replace) agree; boundaries are handled by the character
# classes themselves.
PII_PATTERNS = (
    ("EMAIL", re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")),
    ("IPV4", re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b")),
    ("PHONE", re.compile(r"\+?\d[\d\- ]{7,14}\d")),
)


def pii_scrub_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, text) -> (doc_id, text scrubbed, n_email, n_ipv4, n_phone):
    each PII class replaced by its <TAG>. One streaming pass, no state —
    the standard pre-training redaction step. Patterns are ordered
    (emails first, so their digits never re-match as phones)."""
    ids = batch.column("doc_id")
    texts = batch.column(text_col).to_pylist()
    out_text: List[str] = []
    counts = {tag: [] for tag, _ in PII_PATTERNS}
    for t in texts:
        s = t or ""
        for tag, pat in PII_PATTERNS:
            s, k = pat.subn(f"<{tag}>", s)
            counts[tag].append(k)
        out_text.append(s)
    return pa.table(
        {
            "doc_id": ids,
            "text": pa.array(out_text, pa.string()),
            "n_email": pa.array(counts["EMAIL"], pa.int32()),
            "n_ipv4": pa.array(counts["IPV4"], pa.int32()),
            "n_phone": pa.array(counts["PHONE"], pa.int32()),
        }
    )


def pii_scrub(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    return ds.select_columns(["doc_id", text_col]).map_batches(
        lambda b: pii_scrub_batch(b, text_col), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# BPE-ish token counting (pre-tokenizer segment counts)
# ---------------------------------------------------------------------------

#: GPT-2-style pre-tokenizer, ASCII-simplified and lookahead-free so python
#: re and RE2 (DuckDB regexp_extract_all) segment identically: contraction
#: suffixes, space-prefixed letter/digit runs, punctuation runs, whitespace.
BPE_PRETOKEN_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)
_BPE_RE = re.compile(BPE_PRETOKEN_PATTERN)
_WS_RE = re.compile(r"\S+")


def bpe_token_counts(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_bpe_tokens, n_ws_tokens): pre-tokenizer segment count (a
    cheap, deterministic token-budget proxy for BPE vocabularies — real
    BPE merges only split WITHIN these segments, so this upper-bounds and
    tracks the true token count) plus the whitespace token count. One
    stateless streaming pass."""

    def counts(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        nb = [len(_BPE_RE.findall(t or "")) for t in texts]
        nw = [len(_WS_RE.findall(t or "")) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pa.array(nb, pa.int64()),
                "n_ws_tokens": pa.array(nw, pa.int64()),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow"
    )


def pack_sequences(
    ds: "ray.data.Dataset",
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_size: int = 4096,
) -> "ray.data.Dataset":
    """GPT-style sequence packing (concat-and-chunk): documents are laid
    end-to-end in ascending ``doc_id`` order into one global token stream
    cut every ``seq_len`` tokens; each doc reports its token span and the
    training-sequence range it lands in. -> Dataset(doc_id, n_tokens,
    tok_start, seq_first, seq_last), zero-token docs omitted.

    Distributed prefix-sum shape (the part a naive implementation gets
    wrong at scale): pass 1 computes per-BUCKET token totals
    (bucket = doc_id // bucket_size) with one bounded groupby — the
    driver sees one row per bucket, never per doc; the bucket-offset
    prefix table is broadcast via the object store; pass 2 sorts each
    bucket's docs locally (one map_groups) and assigns intra-bucket
    prefixes. Nothing corpus-sized touches the driver, both shuffles
    key on the SAME bounded bucket id."""
    import ray

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def counts(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        n = np.fromiter(
            (
                len(_TOKEN_RE.findall((t or "").lower()))
                for t in batch.column(text_col).to_pylist()
            ),
            dtype=np.int64,
            count=len(batch),
        )
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "n_tokens": pa.array(n),
                "_bucket": pa.array((ids // bucket_size).astype(np.int64)),
            }
        )

    counted = ds.select_columns([id_col, text_col]).map_batches(
        counts, batch_format="pyarrow"
    ).materialize()  # consumed twice (bucket totals + assignment)

    totals = (
        counted.groupby("_bucket")
        .sum("n_tokens")
        .to_pandas()
        .sort_values("_bucket")
    )  # one row per bucket — bounded by id-range/bucket_size
    buckets = totals["_bucket"].to_numpy()
    bucket_offsets = np.concatenate(
        ([0], np.cumsum(totals["sum(n_tokens)"].to_numpy())[:-1])
    ).astype(np.int64)
    off_ref = ray.put(dict(zip(buckets.tolist(), bucket_offsets.tolist())))

    def assign(group: pa.Table) -> pa.Table:
        import ray as _ray

        offsets = _ray.get(off_ref)
        b = int(group.column("_bucket")[0].as_py())
        ids = group.column("doc_id").to_numpy()
        n = group.column("n_tokens").to_numpy()
        order = np.argsort(ids)
        ids, n = ids[order], n[order]
        start = offsets[b] + np.concatenate(([0], np.cumsum(n)[:-1]))
        keep = n > 0
        ids, n, start = ids[keep], n[keep], start[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "n_tokens": pa.array(n.astype(np.int64)),
                "tok_start": pa.array(start.astype(np.int64)),
                "seq_first": pa.array((start // seq_len).astype(np.int64)),
                "seq_last": pa.array(
                    ((start + n - 1) // seq_len).astype(np.int64)
                ),
            }
        )

    return counted.groupby("_bucket").map_groups(
        assign, batch_format="pyarrow"
    )
