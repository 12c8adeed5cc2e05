"""Pluggable non-BM25 similarities via the scorer protocol.

The engine's per-term scorer protocol (``score_array(tfs, keys)`` /
``max_score`` / ``frontier_m`` / ``ratio_array`` / ``scores_from_m`` /
``cache_key`` / ``ratio_key``, see functions/bm25.py) is similarity-
agnostic; this module adds the two most-used alternatives:

* :class:`LMDirichlet` — language model with Bayesian (Dirichlet)
  smoothing (reference: core/src/java/org/apache/lucene/search/
  similarities/LMDirichletSimilarity.java:76-82 —
  ``score = boost * (log(1 + freq/(mu*p)) + log(mu/(dl+mu)))`` clamped
  at 0, with the default collection model
  ``p = (totalTermFreq+1)/(sumTotalTermFreq+1)``
  (LMSimilarity.java:151-153)).
* :class:`ClassicTFIDF` — the classic vector-space TF-IDF (reference:
  similarities/ClassicSimilarity.java + TFIDFSimilarity.java:472-476 —
  ``score = sqrt(freq) * (boost * idf) * 1/sqrt(dl)`` with
  ``idf = log((docCount+1)/(docFreq+1)) + 1``).

Both run the float64 exact chain (norm key = exact doc length) or the
byte4 chain (key decodes through SmallFloat's LENGTH_TABLE like the
reference's norm decode). Unlike BM25, neither factors into a
weight x monotone-ratio form, so ``frontier_m`` returns the frontier's
max SCORE and ``scores_from_m`` is the identity — still a valid upper
bound, but the block-max executor routes these scorers through the
exhaustive path (LMDirichlet can clamp in-document scores to 0, which
interval pruning does not model).

Selection: set ``reader.similarity`` to ``("lmd", mu)`` or
``("classic",)`` (None = BM25, the default) — the per-searcher
IndexSearcher.setSimilarity analogue, same contract as
``reader.bm25_params``.
"""

from __future__ import annotations

import numpy as np

from .smallfloat import LENGTH_TABLE


class _LenDecode:
    def __init__(self, norm_kind: str):
        self.norm_kind = norm_kind
        self.dtype = np.float32 if norm_kind == "byte4" else np.float64

    def doc_len(self, keys: np.ndarray) -> np.ndarray:
        if self.norm_kind == "byte4":
            return LENGTH_TABLE[keys.astype(np.int64)].astype(np.float64)
        return keys.astype(np.float64)


class LMDirichlet(_LenDecode):
    """LMDirichletSimilarity analogue (per-term scorer instance)."""

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int, mu: float = 2000.0,
                 boost: float = 1.0):
        super().__init__(norm_kind)
        if not np.isfinite(mu) or mu < 0:
            raise ValueError(f"illegal mu value: {mu}")
        self.mu = float(mu)
        self.boost = float(boost)
        # DefaultCollectionModel.computeProbability
        self.p_col = (total_tf + 1.0) / (sum_total_tf + 1.0)
        self._key = ("lmd", norm_kind, doc_count, sum_total_tf, doc_freq,
                     total_tf, mu, boost)

    def cache_key(self):
        return self._key

    def ratio_key(self):
        # the cached block bound IS the score here -> term-specific
        return self._key

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        dl = self.doc_len(keys)
        s = self.boost * (
            np.log(1.0 + tf / (self.mu * self.p_col))
            + np.log(self.mu / (dl + self.mu))
        )
        return np.maximum(s, 0.0).astype(self.dtype, copy=False)

    def max_score(self, frontier_tfs, frontier_keys) -> float:
        if len(frontier_tfs) == 0:
            return 0.0
        return float(self.score_array(frontier_tfs, frontier_keys).max())

    def frontier_m(self, frontier_tfs, frontier_keys) -> float:
        return self.max_score(frontier_tfs, frontier_keys)

    def ratio_array(self, tfs, keys) -> np.ndarray:
        return self.score_array(tfs, keys).astype(np.float64, copy=False)

    def scores_from_m(self, m: np.ndarray) -> np.ndarray:
        return m.astype(self.dtype, copy=False)


class ClassicTFIDF(_LenDecode):
    """ClassicSimilarity (TF-IDF) analogue (per-term scorer instance)."""

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int = 0, boost: float = 1.0):
        super().__init__(norm_kind)
        self.boost = float(boost)
        self.idf = np.log((doc_count + 1.0) / (doc_freq + 1.0)) + 1.0
        self.weight = self.boost * self.idf
        self._key = ("classic", norm_kind, doc_count, doc_freq, boost)

    def cache_key(self):
        return self._key

    def ratio_key(self):
        return self._key

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = np.sqrt(tfs.astype(np.float64))
        dl = self.doc_len(keys)
        with np.errstate(divide="ignore"):
            norm = 1.0 / np.sqrt(dl)
        s = (tf * self.weight) * norm
        return s.astype(self.dtype, copy=False)

    def max_score(self, frontier_tfs, frontier_keys) -> float:
        if len(frontier_tfs) == 0:
            return 0.0
        return float(self.score_array(frontier_tfs, frontier_keys).max())

    def frontier_m(self, frontier_tfs, frontier_keys) -> float:
        return self.max_score(frontier_tfs, frontier_keys)

    def ratio_array(self, tfs, keys) -> np.ndarray:
        return self.score_array(tfs, keys).astype(np.float64, copy=False)

    def scores_from_m(self, m: np.ndarray) -> np.ndarray:
        return m.astype(self.dtype, copy=False)


def make_similarity(sim, norm_kind: str, doc_count: int, sum_total_tf: int,
                    doc_freq: int, total_tf: int, boost: float = 1.0):
    """Factory for a ``reader.similarity`` spec tuple."""
    name = sim[0]
    if name == "lmd":
        mu = float(sim[1]) if len(sim) > 1 else 2000.0
        return LMDirichlet(norm_kind, doc_count, sum_total_tf, doc_freq,
                           total_tf, mu=mu, boost=boost)
    if name == "classic":
        return ClassicTFIDF(norm_kind, doc_count, sum_total_tf, doc_freq,
                            total_tf, boost=boost)
    raise ValueError(f"unknown similarity {sim!r}")
