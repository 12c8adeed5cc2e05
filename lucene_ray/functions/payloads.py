"""PayloadScoreQuery: score docs by a function of a term's per-occurrence
payloads (reference: queries/src/java/org/apache/lucene/queries/payloads/
PayloadScoreQuery.java — wraps a span query, collects each matched
position's payload through a PayloadDecoder, folds them with a
PayloadFunction, and optionally multiplies by the wrapped query's score).

Implemented shape: the SpanTermQuery wrap (the common term-weighting use),
reading the ``.pay`` sidecar written by ``IndexConfig(payloads=True)``
builds (the DelimitedPayloadTokenFilter analogue in functions/analysis.py).

Functions (reference: MaxPayloadFunction.java:26-43,
MinPayloadFunction.java:23-40, AveragePayloadFunction.java:27-44,
SumPayloadFunction.java): per doc fold every non-missing payload (a token
without a delimiter carries none — stored NaN — and does not count toward
``numPayloadsSeen``); ``docScore`` is the folded value when
``numPayloadsSeen > 0`` and the neutral 1.0 otherwise, exactly the
reference's ``numPayloadsSeen > 0 ? payloadScore : 1``.

``include_span_score=True`` multiplies by the term's similarity score
(PayloadScoreQuery.java includeSpanScore ctor flag); the default
False returns the payload score alone, SQL-expressible for the oracle.
"""

from __future__ import annotations

import numpy as np

from .query import _term_scorer, _topk_from

PAYLOAD_FUNCTIONS = ("max", "min", "avg", "sum")


def payload_doc_scores(reader, term: str, function: str = "max"):
    """-> (docs:int64, scores) for every doc containing ``term``; scores
    in the reader's score dtype (float32 for byte4 norms, float64 exact),
    folded per the named PayloadFunction with the reference's neutral-1.0
    no-payload fallback. Tombstoned docs (liveDocs) are dropped."""
    if function not in PAYLOAD_FUNCTIONS:
        raise ValueError(
            f"unknown payload function {function!r}; one of {PAYLOAD_FUNCTIONS}"
        )
    docs, tfs, flat = reader.term_payloads(term)
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    if len(docs) == 0:
        return docs, np.empty(0, dtype=dtype)
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1])).astype(np.int64)
    valid = ~np.isnan(flat)
    seen = np.add.reduceat(valid.astype(np.int64), starts)
    flat64 = flat.astype(np.float64)
    if function == "max":
        agg = np.maximum.reduceat(np.where(valid, flat64, -np.inf), starts)
    elif function == "min":
        agg = np.minimum.reduceat(np.where(valid, flat64, np.inf), starts)
    else:
        agg = np.add.reduceat(np.where(valid, flat64, 0.0), starts)
        if function == "avg":
            with np.errstate(invalid="ignore", divide="ignore"):
                agg = agg / seen
    scores = np.where(seen > 0, agg, 1.0).astype(dtype)
    deleted = getattr(reader, "deleted", None)
    if deleted is not None and len(deleted) and len(docs):
        pos = np.minimum(np.searchsorted(deleted, docs), len(deleted) - 1)
        keep = deleted[pos] != docs
        docs, scores = docs[keep], scores[keep]
    return docs, scores


def score_payload(reader, term: str, k: int = 10, function: str = "max",
                  include_span_score: bool = False):
    """Top-k (score desc, doc asc) under the payload function; with
    ``include_span_score`` the payload score multiplies the term's
    similarity score (reference: PayloadScoreQuery.java includeSpanScore —
    the two-arg ctor defaults to including it; our default False keeps the
    pure payload ranking)."""
    docs, scores = payload_doc_scores(reader, term, function)
    if include_span_score and len(docs):
        df, ttf = reader.term_stats(term)
        scorer = _term_scorer(reader, df, ttf)
        tagged = []
        for seg in reader._segments_for(term):
            for b, tp in seg.postings_with_buckets(term):
                d, t, key = tp.decode_all()
                tagged.append((b, t, key))
        tagged.sort(key=lambda x: x[0])
        tfs = np.concatenate([x[1] for x in tagged])
        keys = np.concatenate([x[2] for x in tagged])
        sim = scorer.score_array(tfs, keys)
        deleted = getattr(reader, "deleted", None)
        if deleted is not None and len(deleted):
            # payload_doc_scores dropped tombstones; realign sim scores
            alldocs, _, _ = reader.term_payloads(term)
            pos = np.minimum(
                np.searchsorted(deleted, alldocs), len(deleted) - 1
            )
            sim = sim[deleted[pos] != alldocs]
        scores = (scores.astype(np.float64) * sim.astype(np.float64)).astype(
            scores.dtype
        )
    return _topk_from(docs, scores, k)


# ---------------------------------------------------------------------------
# SpanPayloadCheckQuery (round 4)
# ---------------------------------------------------------------------------

_OPS = {
    "eq": lambda p, v: p == v,
    "gt": lambda p, v: p > v,
    "gte": lambda p, v: p >= v,
    "lt": lambda p, v: p < v,
    "lte": lambda p, v: p <= v,
}


def _payload_keys(reader, term: str):
    """Doc-tagged position keys of ``term`` with the parallel payload
    array (both streams were written from one lexsort, so occurrence
    order matches exactly). Cached on the reader."""
    from .query import _POS_SHIFT

    cache = reader.__dict__.setdefault("_payload_keys", {})
    hit = cache.get(term)
    if hit is None:
        docs, tfs, flat_pos = reader.term_positions(term)
        _, _, flat_pay = reader.term_payloads(term)
        keys = (np.repeat(docs, tfs) << np.int64(_POS_SHIFT)) + flat_pos.astype(
            np.int64
        )
        hit = (keys, flat_pay.astype(np.float64))
        cache[term] = hit
    return hit


def score_span_payload_check(reader, terms, payloads, op: str = "eq",
                             slop: int = 0, k: int = 10):
    """SpanPayloadCheckQuery analogue (reference: queries/src/java/org/
    apache/lucene/queries/payloads/SpanPayloadCheckQuery.java:44-247 —
    FilterSpans accepting only spans whose per-position payloads match
    the expected list under a MatchOperation; EQ/GT/GTE/LT/LTE via
    PayloadMatcherFactory). Implemented shapes: a single term (width-1
    spans whose payload matches ``payloads[0]``) and a TWO-term ordered
    near chain within ``slop`` where link i's payload matches
    ``payloads[i]``. A position with no payload (NaN) never matches
    (the reference rejects null payloads for numeric types). Scoring =
    the span convention (idf summed over clause terms, span freq =
    sum of 1/(1+gap))."""
    from .bm25 import make_scorer
    from .query import _gather_norm_keys, _topk_from
    from .spans import _freqs_by_doc, _ordered_chains

    if op not in _OPS:
        raise ValueError(f"unknown payload match operation {op!r}")
    if len(terms) not in (1, 2) or len(payloads) != len(terms):
        raise ValueError(
            "span_payload_check supports 1 or 2 terms with one expected "
            "payload per position"
        )
    import math

    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype))
    cmp = _OPS[op]
    idf64 = 0.0
    filtered = []
    for t, want in zip(terms, payloads):
        df, _ = reader.term_stats(t)
        if df == 0:
            return empty
        idf64 += math.log(1.0 + (reader.doc_count - df + 0.5) / (df + 0.5))
        keys, pays = _payload_keys(reader, t)
        with np.errstate(invalid="ignore"):
            m = cmp(pays, float(want))
        m &= ~np.isnan(pays)
        filtered.append(keys[m])
    if len(filtered) == 1:
        if len(filtered[0]) == 0:
            return empty
        docs_u, pf = _freqs_by_doc(filtered[0], np.ones(len(filtered[0])))
    else:
        anchors, _ends, gaps = _ordered_chains(filtered)
        keep = gaps <= slop
        if not keep.any():
            return empty
        docs_u, pf = _freqs_by_doc(
            anchors[keep], 1.0 / (1.0 + gaps[keep])
        )
    deleted = getattr(reader, "deleted", None)
    if deleted is not None and len(deleted) and len(docs_u):
        pos = np.minimum(np.searchsorted(deleted, docs_u), len(deleted) - 1)
        alive = deleted[pos] != docs_u
        docs_u, pf = docs_u[alive], pf[alive]
    if len(docs_u) == 0:
        return empty
    norm_keys = _gather_norm_keys(reader, terms[0], docs_u)
    k1, b = getattr(reader, "bm25_params", (1.2, 0.75))
    scorer = make_scorer(
        reader.norm_kind, reader.doc_count, reader.sum_total_tf, 1,
        k1=k1, b=b,
    )
    if reader.norm_kind == "byte4":
        scorer.idf = np.float32(idf64)
        scorer.weight = np.float32(idf64)
    else:
        scorer.idf = idf64
        scorer.weight = idf64
    scores = scorer.score_array(np.asarray(pf), norm_keys)
    return _topk_from(
        docs_u.astype(np.int64), scores.astype(dtype, copy=False), k
    )


def score_payload_span(reader, terms, k: int = 10, function: str = "max",
                       slop: int = 0, include_span_score: bool = False):
    """PayloadScoreQuery wrapping an ordered two-term SpanNearQuery
    (reference: PayloadScoreQuery.java — the span collector visits EVERY
    matched position of every matched span, so a chain contributes BOTH
    link positions' payloads to the fold; numPayloadsSeen counts the
    non-missing ones). Fold semantics and the neutral-1.0 fallback match
    :func:`payload_doc_scores`; ``include_span_score`` multiplies by the
    span's BM25 score (idf summed over the clause terms, span freq =
    sum of 1/(1+gap), the engine's span convention)."""
    from .bm25 import make_scorer
    from .query import _POS_SHIFT, _gather_norm_keys, _topk_from
    from .spans import _freqs_by_doc, _ordered_chains

    if function not in PAYLOAD_FUNCTIONS:
        raise ValueError(
            f"unknown payload function {function!r}; one of {PAYLOAD_FUNCTIONS}"
        )
    if len(terms) != 2:
        raise ValueError("span payload scoring supports two ordered clauses")
    import math

    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype))
    idf64 = 0.0
    keypay = []
    for t in terms:
        df, _ = reader.term_stats(t)
        if df == 0:
            return empty
        idf64 += math.log(1.0 + (reader.doc_count - df + 0.5) / (df + 0.5))
        keypay.append(_payload_keys(reader, t))
    anchors, ends, gaps = _ordered_chains([keypay[0][0], keypay[1][0]])
    keep = gaps <= slop
    if not keep.any():
        return empty
    anchors, ends, gaps = anchors[keep], ends[keep], gaps[keep]
    # payload at each link position (streams are key-sorted: searchsorted)
    pay_a = keypay[0][1][np.searchsorted(keypay[0][0], anchors)]
    pay_b = keypay[1][1][np.searchsorted(keypay[1][0], ends)]
    docs = anchors >> np.int64(_POS_SHIFT)
    docs_u, inv = np.unique(docs, return_inverse=True)
    flat = np.concatenate([pay_a, pay_b])
    seg = np.concatenate([inv, inv])
    valid = ~np.isnan(flat)
    seen = np.bincount(seg[valid], minlength=len(docs_u))
    if function == "max":
        agg = np.full(len(docs_u), -np.inf)
        np.maximum.at(agg, seg[valid], flat[valid])
    elif function == "min":
        agg = np.full(len(docs_u), np.inf)
        np.minimum.at(agg, seg[valid], flat[valid])
    else:
        agg = np.bincount(seg[valid], weights=flat[valid],
                          minlength=len(docs_u))
        if function == "avg":
            with np.errstate(invalid="ignore", divide="ignore"):
                agg = agg / seen
    scores = np.where(seen > 0, agg, 1.0).astype(dtype)
    if include_span_score:
        _, pf = _freqs_by_doc(anchors, 1.0 / (1.0 + gaps))
        norm_keys = _gather_norm_keys(reader, terms[0], docs_u)
        k1, b = getattr(reader, "bm25_params", (1.2, 0.75))
        scorer = make_scorer(
            reader.norm_kind, reader.doc_count, reader.sum_total_tf, 1,
            k1=k1, b=b,
        )
        if reader.norm_kind == "byte4":
            scorer.idf = np.float32(idf64)
            scorer.weight = np.float32(idf64)
        else:
            scorer.idf = idf64
            scorer.weight = idf64
        span_s = scorer.score_array(np.asarray(pf), norm_keys)
        scores = (
            scores.astype(np.float64) * span_s.astype(np.float64)
        ).astype(dtype)
    deleted = getattr(reader, "deleted", None)
    if deleted is not None and len(deleted) and len(docs_u):
        pos = np.minimum(np.searchsorted(deleted, docs_u), len(deleted) - 1)
        alive = deleted[pos] != docs_u
        docs_u, scores = docs_u[alive], scores[alive]
    return _topk_from(docs_u.astype(np.int64), scores, k)
