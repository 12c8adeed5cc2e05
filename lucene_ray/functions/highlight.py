"""Query-term highlighting: best-fragment snippet extraction.

Reference: the highlighter module (highlighter/src/java/org/apache/lucene/
search/uhighlight/UnifiedHighlighter.java and
highlight/Highlighter.java + SimpleHTMLFormatter — 14,932 LoC inventoried
in SURVEY.md §2). Same contract, deterministic algorithm:

1. re-analyze the stored text with OFFSETS: the same tokenizer produces
   surface tokens in order; offsets are recovered with a running-cursor
   scan (tokens are substrings of the text in order; a 255-chop token is a
   prefix of the remaining text, so the cursor scan stays exact);
2. each token maps through the analyzer's per-token chain to its index
   term; tokens whose term is in the query-term set are match tokens
   (UnifiedHighlighter also matches on terms post-analysis);
3. fragment selection: candidate windows start at each match token and
   extend ``frag_size`` characters; the winner maximizes
   (distinct matched terms, total matches, -start) — earliest best
   window, deterministic;
4. matched tokens inside the window are wrapped ``<b>...</b>``
   (SimpleHTMLFormatter's default tags).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from .tokenize import tokenize


def token_offsets(text: str) -> List[Tuple[str, int, int]]:
    """(surface_token, start, end) in text order via running-cursor scan."""
    out = []
    pos = 0
    for tok in tokenize(text):
        i = text.find(tok, pos)
        if i < 0:  # cannot happen for our tokenizers; stay safe
            continue
        out.append((tok, i, i + len(tok)))
        pos = i + len(tok)
    return out


def _term_of(analyzer, token: str) -> Optional[str]:
    """Map one surface token through the analyzer's per-token chain."""
    term_fn = getattr(analyzer, "_term", None)
    if term_fn is not None:
        return term_fn(token)
    terms = analyzer.analyze(token)
    return terms[0] if terms else None


def _analysis_matches(text: str, query_terms: Sequence[str], analyzer):
    """[(start, end, term)] in text order via re-analysis (the
    UnifiedHighlighter ANALYSIS offset source)."""
    qset = set(query_terms)
    return [
        (s, e, term)
        for tok, s, e in token_offsets(text)
        for term in (_term_of(analyzer, tok),)
        if term in qset
    ]


def index_matches(reader, doc_id: int, query_terms: Sequence[str]):
    """[(start, end, term)] in text order read straight off the postings
    offsets (.off sidecar) — UnifiedHighlighter's OffsetSource.POSTINGS:
    no re-analysis of the stored text, cost O(query terms), not O(doc
    tokens). Per-term (docs, tf-cumsum, flat pairs) views are cached on
    the reader (warm searcher state)."""
    import numpy as np

    cache = reader.__dict__.setdefault("_offsets_view", {})
    out = []
    for term in sorted(set(query_terms)):
        view = cache.get(term)
        if view is None:
            docs, tfs, flat = reader.term_offsets(term)
            starts = np.concatenate(([0], np.cumsum(tfs))).astype(np.int64)
            view = cache[term] = (docs, starts, flat)
        docs, starts, flat = view
        i = int(np.searchsorted(docs, doc_id))
        if i >= len(docs) or int(docs[i]) != doc_id:
            continue
        lo, hi = int(starts[i]) * 2, int(starts[i + 1]) * 2
        pairs = flat[lo:hi]
        out.extend(
            (int(pairs[2 * j]), int(pairs[2 * j + 1]), term)
            for j in range(len(pairs) // 2)
            if int(pairs[2 * j]) >= 0
        )
    out.sort()
    return out


def render_best_fragment(
    text: str,
    matches,
    frag_size: int = 100,
    pre: str = "<b>",
    post: str = "</b>",
) -> str:
    """Fragment selection + wrapping over a prepared match list — shared
    by the re-analysis and postings-offsets sources (byte-identical
    output for identical matches)."""
    if not matches:
        return ""
    # candidate windows anchored at each match start; match ends are
    # strictly increasing (non-overlapping tokens), so the window's last
    # match is a bisect, not a scan
    import bisect

    ends = [e for _, e, _ in matches]
    best = None
    for wi, (ws, _, _) in enumerate(matches):
        w_end = ws + frag_size
        inside = matches[wi : bisect.bisect_right(ends, w_end, lo=wi)]
        score = (len({t for *_se, t in inside}), len(inside), -ws)
        if best is None or score > best[0]:
            best = (score, ws, w_end, inside)
    _, ws, w_end, inside = best
    w_end = min(w_end, len(text))
    parts = []
    cur = ws
    for s, e, _ in inside:
        parts.append(text[cur:s])
        parts.append(pre + text[s:e] + post)
        cur = e
    parts.append(text[cur:w_end])
    frag = "".join(parts)
    if ws > 0:
        frag = "..." + frag
    if w_end < len(text):
        frag = frag + "..."
    return frag


def best_fragment(
    text: str,
    query_terms: Sequence[str],
    analyzer,
    frag_size: int = 100,
    pre: str = "<b>",
    post: str = "</b>",
) -> str:
    """Best ``frag_size``-char snippet with query terms wrapped, '' if the
    text has no match."""
    if not text or not query_terms:
        return ""
    matches = _analysis_matches(text, query_terms, analyzer)
    return render_best_fragment(text, matches, frag_size, pre, post)


def best_fragment_from_index(
    reader,
    doc_id: int,
    text: str,
    query_terms: Sequence[str],
    frag_size: int = 100,
    pre: str = "<b>",
    post: str = "</b>",
) -> str:
    """Offsets-source variant of :func:`best_fragment` — identical output
    when the index was built with ``IndexConfig(offsets=True)`` over the
    same analyzer chain, at O(query terms) per hit instead of a full
    re-analysis of the document."""
    if not text or not query_terms:
        return ""
    matches = index_matches(reader, doc_id, query_terms)
    return render_best_fragment(text, matches, frag_size, pre, post)


class HighlightStage:
    """Actor-pool stage: analyzer compiled once; per batch, produce the
    best fragment for each (text, query) row."""

    def __init__(self, analyzer_name: str, query_terms: Sequence[str],
                 frag_size: int = 100):
        from .analysis import make_analyzer

        self.analyzer = make_analyzer(analyzer_name)
        self.query_terms = tuple(query_terms)
        self.frag_size = frag_size

    def __call__(self, batch):
        import pyarrow as pa

        snippets = [
            best_fragment(t or "", self.query_terms, self.analyzer,
                          self.frag_size)
            for t in batch.column("text").to_pylist()
        ]
        return batch.drop_columns(["text"]).append_column(
            "snippet", pa.array(snippets, pa.string())
        )


def top_passages(
    text: str,
    query_terms: Sequence[str],
    analyzer,
    max_passages: int = 3,
    frag_size: int = 100,
    weights: Optional[dict] = None,
    pre: str = "<b>",
    post: str = "</b>",
) -> List[str]:
    """Top-N NON-OVERLAPPING passages (UnifiedHighlighter's multi-passage
    contract — uhighlight/PassageScorer.java ranks passages by a
    tf-saturated sum of per-term weights; highlightFields returns the
    best N in TEXT order).

    Deterministic variant: candidate windows anchor at each match start
    (frag_size chars); passage score = sum over DISTINCT matched terms of
    weight(term) * (1 + ln(1 + tf_in_passage)) — ``weights`` defaults to
    1.0 per term (callers pass idf for PassageScorer parity). Greedy
    selection: repeatedly take the best-scoring window disjoint from the
    already chosen (score desc, start asc ties), then emit in text order
    with matches wrapped.
    """
    if not text or not query_terms or max_passages <= 0:
        return []
    matches = _analysis_matches(text, query_terms, analyzer)
    return render_passages(
        text, matches, max_passages=max_passages, frag_size=frag_size,
        weights=weights, pre=pre, post=post,
    )


def top_passages_from_index(
    reader,
    doc_id: int,
    text: str,
    query_terms: Sequence[str],
    max_passages: int = 3,
    frag_size: int = 100,
    weights: Optional[dict] = None,
    pre: str = "<b>",
    post: str = "</b>",
) -> List[str]:
    """Offsets-source variant of :func:`top_passages` (identical output
    over an offsets-enabled index, no re-analysis)."""
    if not text or not query_terms or max_passages <= 0:
        return []
    matches = index_matches(reader, doc_id, query_terms)
    return render_passages(
        text, matches, max_passages=max_passages, frag_size=frag_size,
        weights=weights, pre=pre, post=post,
    )


def render_passages(
    text: str,
    matches,
    max_passages: int = 3,
    frag_size: int = 100,
    weights: Optional[dict] = None,
    pre: str = "<b>",
    post: str = "</b>",
) -> List[str]:
    import math

    w = weights or {}
    if not matches:
        return []
    import bisect

    ends = [e for _, e, _ in matches]

    def window(wi: int):
        ws = matches[wi][0]
        w_end = min(ws + frag_size, len(text))
        inside = matches[wi : bisect.bisect_right(ends, w_end, lo=wi)]
        tf: dict = {}
        for *_se, t in inside:
            tf[t] = tf.get(t, 0) + 1
        score = sum(
            w.get(t, 1.0) * (1.0 + math.log(1.0 + c)) for t, c in tf.items()
        )
        return score, ws, w_end, inside

    cands = sorted(
        (window(i) for i in range(len(matches))),
        key=lambda c: (-c[0], c[1]),
    )
    chosen = []
    for score, ws, w_end, inside in cands:
        if len(chosen) >= max_passages:
            break
        if any(not (w_end <= cs or ws >= ce) for _, cs, ce, _ in chosen):
            continue  # overlaps an already-picked passage
        chosen.append((score, ws, w_end, inside))
    chosen.sort(key=lambda c: c[1])  # text order, like highlightFields
    out = []
    for _, ws, w_end, inside in chosen:
        parts = []
        cur = ws
        for s, e, _ in inside:
            parts.append(text[cur:s])
            parts.append(pre + text[s:e] + post)
            cur = e
        parts.append(text[cur:w_end])
        frag = "".join(parts)
        if ws > 0:
            frag = "..." + frag
        if w_end < len(text):
            frag = frag + "..."
        out.append(frag)
    return out


class IndexHighlightStage:
    """Actor-pool stage: postings-offsets highlighter — the reader (and
    its per-term offsets views) load once per actor; per batch each row
    costs O(query terms) bisects, no re-analysis of the text."""

    def __init__(self, index_dir: str, query_terms: Sequence[str],
                 frag_size: int = 100):
        from ..pipelines.search import get_reader

        self.reader = get_reader(index_dir)
        self.query_terms = tuple(query_terms)
        self.frag_size = frag_size

    def __call__(self, batch):
        import pyarrow as pa

        snippets = [
            best_fragment_from_index(
                self.reader, did, t or "", self.query_terms, self.frag_size
            )
            for did, t in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
            )
        ]
        return batch.drop_columns(["text"]).append_column(
            "snippet", pa.array(snippets, pa.string())
        )


class PassageStage:
    """Actor-pool stage: top-N passages per doc, row-expanding
    (doc_id, passage_idx, snippet)."""

    def __init__(self, analyzer_name: str, query_terms: Sequence[str],
                 weights: Optional[dict] = None, max_passages: int = 2,
                 frag_size: int = 80):
        from .analysis import make_analyzer

        self.analyzer = make_analyzer(analyzer_name)
        self.query_terms = tuple(query_terms)
        self.weights = dict(weights or {})
        self.max_passages = max_passages
        self.frag_size = frag_size

    def __call__(self, batch):
        import pyarrow as pa

        ids_out, idx_out, snip_out = [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            for i, p in enumerate(
                top_passages(
                    t or "", self.query_terms, self.analyzer,
                    max_passages=self.max_passages,
                    frag_size=self.frag_size, weights=self.weights,
                )
            ):
                ids_out.append(did)
                idx_out.append(i)
                snip_out.append(p)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "passage_idx": pa.array(idx_out, pa.int32()),
                "snippet": pa.array(snip_out, pa.string()),
            }
        )
