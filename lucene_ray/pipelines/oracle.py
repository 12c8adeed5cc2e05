"""Brute-force correctness oracle: exhaustive in-memory BM25 scoring.

Deliberately shares NO code with the segment encode/decode path (only the
analysis chain and the scorer formulas, which define the semantics): builds
uncompressed postings dicts in RAM and scores every matching doc. The
distributed engine must be rank- and score-identical to this on any corpus
(reference analogue: the dumb-scorer-vs-smart-scorer tests, e.g.
core/src/test/org/apache/lucene/search/TestWANDScorer.java and
tests/search/CheckHits.java re-scoring via explain).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..functions.analysis import make_analyzer
from ..functions.bm25 import make_scorer
from ..functions.query import BooleanQuery, TermQuery
from ..functions.smallfloat import int_to_byte4


class OracleIndex:
    """In-memory exhaustive index over (doc_id, text) rows."""

    def __init__(self, doc_ids: Sequence[int], texts: Sequence[str],
                 analyzer: str = "standard_en", norm_kind: str = "byte4"):
        self.analyzer_name = analyzer
        self.norm_kind = norm_kind
        an = make_analyzer(analyzer)
        post: Dict[str, List[Tuple[int, int, int]]] = {}
        sum_tf = 0
        n_docs = 0
        for did, text in zip(doc_ids, texts):
            n_docs += 1
            terms = an.analyze(text) if text else []
            if not terms:
                continue
            dl = len(terms)
            sum_tf += dl
            key = int(int_to_byte4(dl)) if norm_kind == "byte4" else dl
            for t, tf in Counter(terms).items():
                post.setdefault(t, []).append((int(did), tf, key))
        self.doc_count = n_docs
        self.sum_total_tf = sum_tf
        self.postings: Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for t, rows in post.items():
            rows.sort()
            arr = np.asarray(rows, dtype=np.int64)
            self.postings[t] = (arr[:, 0], arr[:, 1], arr[:, 2])
        self._analyzer = an
        self._vocab: List[str] = sorted(self.postings)
        self.bm25_params = (1.2, 0.75)  # query-time similarity params

    def topk(self, query, k: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        """Exhaustive scoring with the canonical sorted-term accumulation
        order and (score desc, doc_id asc) ties — the ground truth."""
        if isinstance(query, TermQuery):
            query = BooleanQuery(should=(query.term,))
        if getattr(query, "multi", ()):
            from ..functions.multiterm import resolve_multi

            query = resolve_multi(query, self._vocab)
        dtype = np.float32 if self.norm_kind == "byte4" else np.float64
        must = sorted(set(query.must))
        should = sorted(set(query.should) - set(must))
        msm = query.minimum_should_match
        for t in must:
            if t not in self.postings:
                return np.empty(0, np.int64), np.empty(0, dtype)
        scoring = sorted(must + [t for t in should if t in self.postings])
        if not scoring:
            return np.empty(0, np.int64), np.empty(0, dtype)
        # candidates
        if must:
            cand = None
            for t in must:
                d = self.postings[t][0]
                cand = d if cand is None else np.intersect1d(cand, d)
            if msm > 0:
                sd = [self.postings[t][0] for t in should if t in self.postings]
                if sd:
                    u, c = np.unique(np.concatenate(sd), return_counts=True)
                    cand = np.intersect1d(cand, u[c >= msm])
                else:
                    cand = cand[:0]
        else:
            sd = [self.postings[t][0] for t in scoring]
            u, c = np.unique(np.concatenate(sd), return_counts=True)
            cand = u[c >= max(1, msm)]
        for t in sorted(set(query.must_not)):
            if t in self.postings and len(cand):
                cand = np.setdiff1d(cand, self.postings[t][0], assume_unique=True)
        if len(cand) == 0:
            return cand, np.empty(0, dtype)
        acc = np.zeros(len(cand), dtype=dtype)
        boost_map = dict(getattr(query, "boosts", ()))
        k1, b = self.bm25_params
        for t in scoring:
            docs, tfs, keys = self.postings[t]
            scorer = make_scorer(
                self.norm_kind, self.doc_count, self.sum_total_tf, len(docs),
                k1=k1, b=b, boost=boost_map.get(t, 1.0),
            )
            pos = np.searchsorted(docs, cand)
            pos_c = np.minimum(pos, len(docs) - 1)
            hit = docs[pos_c] == cand
            if hit.any():
                acc[hit] += scorer.score_array(tfs[pos_c[hit]], keys[pos_c[hit]]).astype(dtype)
        order = np.lexsort((cand, -acc.astype(np.float64)))[:k]
        return cand[order], acc[order]

    def topk_dismax(self, query, k: int = 10):
        """Brute-force DisjunctionMaxQuery: per doc, max matching score
        plus tie_breaker * (sum - max), canonical sorted-term order."""
        dtype = np.float32 if self.norm_kind == "byte4" else np.float64
        terms = [t for t in sorted(set(query.terms)) if t in self.postings]
        if not terms:
            return np.empty(0, np.int64), np.empty(0, dtype)
        cand = np.unique(
            np.concatenate([self.postings[t][0] for t in terms])
        )
        acc_sum = np.zeros(len(cand), dtype=dtype)
        acc_max = np.zeros(len(cand), dtype=dtype)
        for t in terms:
            docs, tfs, keys = self.postings[t]
            scorer = make_scorer(
                self.norm_kind, self.doc_count, self.sum_total_tf, len(docs)
            )
            pos = np.searchsorted(docs, cand)
            pos_c = np.minimum(pos, len(docs) - 1)
            hit = docs[pos_c] == cand
            s = scorer.score_array(
                tfs[pos_c[hit]], keys[pos_c[hit]]
            ).astype(dtype)
            acc_sum[hit] += s
            acc_max[hit] = np.maximum(acc_max[hit], s)
        tie = np.dtype(dtype).type(query.tie_breaker)
        score = acc_max + tie * (acc_sum - acc_max)
        order = np.lexsort((cand, -score.astype(np.float64)))[:k]
        return cand[order], score[order]


def oracle_from_parquet(sf_dir: str, analyzer: str = "standard_en",
                        norm_kind: str = "byte4") -> OracleIndex:
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text"]
    )
    return OracleIndex(
        tbl.column("doc_id").to_pylist(),
        tbl.column("text").to_pylist(),
        analyzer=analyzer,
        norm_kind=norm_kind,
    )
