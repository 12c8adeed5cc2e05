"""BM25 scoring kernels.

Two scorers over the same (tf, norm-key) posting payloads:

* :class:`BM25Float32` — bit-faithful to the reference formulas
  (reference: core/src/java/org/apache/lucene/search/similarities/
  BM25Similarity.java):
    - idf   = (float) ln(1 + (N - n + 0.5)/(n + 0.5))    (:101-104, double->float)
    - avgdl = (float) (sumTotalTermFreq / docCount)       (:106-109)
    - cache[j] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[j] / avgdl))  (:179-185)
    - score = w - w / (1 + freq * cache[norm]),  w = boost * idf      (:221-237)
  every arithmetic step is kept in np.float32 — the ``w - w/(1+f*inv)``
  rewrite is load-bearing for exactness. Norm key = SmallFloat byte4 of the
  document length.

* :class:`BM25Float64` — same model evaluated in float64 with the *exact*
  document length as the norm key and the textbook op order
  ``idf * tf / (tf + k1*(1 - b + b*dl/avgdl))``; this is arithmetic DuckDB can
  reproduce literally, giving a hash-exact SQL oracle for end-to-end runs.

Both expose ``score_array(tfs, keys)`` (vectorized bulk scoring) and
``max_score(frontier)`` (block upper bound from a competitive (tf, key)
impact frontier) so WAND-style pruning is scorer-agnostic.
"""

from __future__ import annotations

import math

import numpy as np

from .smallfloat import LENGTH_TABLE

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


class BM25Float32:
    """Per-(term, field) scorer; instantiate once per query term."""

    dtype = np.float32
    norm_kind = "byte4"  # posting key column = SmallFloat byte of doc length

    def __init__(self, doc_count: int, sum_total_tf: int, doc_freq: int,
                 k1: float = K1_DEFAULT, b: float = B_DEFAULT,
                 boost: float = 1.0):
        # idf computed in double then narrowed, like the reference
        idf64 = math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))
        self.idf = np.float32(idf64)
        self.k1 = float(k1)
        self.b = float(b)
        self.boost = float(boost)
        avgdl = np.float32(sum_total_tf / float(doc_count))
        self.avgdl = float(avgdl)
        k1f = np.float32(k1)
        bf = np.float32(b)
        one = np.float32(1.0)
        # cache[j] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[j] / avgdl));
        # k1=0 divides to +inf, which cancels correctly downstream
        # (w - w/(1+f*inf) = w) — silence the benign warning only
        with np.errstate(divide="ignore"):
            self.cache = (
                one / (k1f * ((one - bf) + (bf * LENGTH_TABLE) / avgdl))
            ).astype(np.float32)
        self.weight = np.float32(boost) * self.idf
        self._key = ("byte4", doc_count, sum_total_tf, doc_freq, k1, b, boost)

    def cache_key(self):
        """Identity of this scorer's (tf, key) -> score map; used to cache
        per-term bulk scores across queries (the map is query-independent)."""
        return self._key

    def ratio_key(self):
        """Identity of the monotone ratio map (frontier_m): depends on
        norm_kind, collection stats, k1, b — NOT on df or boost."""
        return (self._key[0], self._key[1], self._key[2], self._key[4],
                self._key[5])

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        """Bulk score: tfs int array, keys = norm bytes (0..255)."""
        freq = tfs.astype(np.float32)
        inv = self.cache[keys]  # any integer dtype indexes directly
        w = self.weight
        return w - w / (np.float32(1.0) + freq * inv)

    def max_score(self, frontier_tfs: np.ndarray, frontier_keys: np.ndarray) -> float:
        if len(frontier_tfs) == 0:
            return 0.0
        return float(self.score_array(frontier_tfs, frontier_keys).max())

    def bound_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        """Upper-bound scores for (block max tf, block min key) pairs.

        For BM25 (antitone in decoded doc length) the bound IS the score
        at those extremes; scorers whose length norm is not monotone
        (SweetSpotSimilarity's plateau) override this with a relaxation
        that stays a valid upper bound."""
        return self.score_array(tfs, keys)

    # -- query-independent block-max split: score = g(w, m) with m the
    # per-block max of freq*cache[norm]; g monotone non-decreasing in m, so
    # m can be cached on the postings across queries (weight w varies, the
    # frontier argmax does not). Same float32 ops as max_score => identical.
    def frontier_m(self, frontier_tfs: np.ndarray, frontier_keys: np.ndarray) -> float:
        if len(frontier_tfs) == 0:
            return 0.0
        freq = frontier_tfs.astype(np.float32)
        inv = self.cache[frontier_keys.astype(np.int64)]
        return float((freq * inv).max())

    def ratio_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        """Vectorized monotone ratio for frontier pairs (bulk frontier_m)."""
        return tfs.astype(np.float32) * self.cache[keys.astype(np.int64)]

    def scores_from_m(self, m: np.ndarray) -> np.ndarray:
        w = self.weight
        return w - w / (np.float32(1.0) + m.astype(np.float32))


class BM25Float64:
    """SQL-parity scorer: float64, exact doc length as the norm key."""

    dtype = np.float64
    norm_kind = "exact"  # posting key column = exact doc length (int)

    def __init__(self, doc_count: int, sum_total_tf: int, doc_freq: int,
                 k1: float = K1_DEFAULT, b: float = B_DEFAULT,
                 boost: float = 1.0):
        self.idf = math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))
        self.avgdl = sum_total_tf / float(doc_count)
        self.k1 = float(k1)
        self.b = float(b)
        self.boost = float(boost)
        self.weight = float(boost) * self.idf
        self._key = ("exact", doc_count, sum_total_tf, doc_freq, k1, b, boost)

    def cache_key(self):
        return self._key

    def ratio_key(self):
        return (self._key[0], self._key[1], self._key[2], self._key[4],
                self._key[5])

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        dl = keys.astype(np.float64)
        denom = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        # boost applied OUTSIDE idf*ratio — the literal op order of the SQL
        # oracle's `score * boost` over its per-(doc,term) idf*ratio column
        if self.boost == 1.0:
            return self.idf * (tf / denom)
        return self.boost * (self.idf * (tf / denom))

    def max_score(self, frontier_tfs: np.ndarray, frontier_keys: np.ndarray) -> float:
        if len(frontier_tfs) == 0:
            return 0.0
        return float(self.score_array(frontier_tfs, frontier_keys).max())

    def bound_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        return self.score_array(tfs, keys)

    def frontier_m(self, frontier_tfs: np.ndarray, frontier_keys: np.ndarray) -> float:
        if len(frontier_tfs) == 0:
            return 0.0
        tf = frontier_tfs.astype(np.float64)
        dl = frontier_keys.astype(np.float64)
        denom = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        return float((tf / denom).max())

    def ratio_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        dl = keys.astype(np.float64)
        return tf / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))

    def scores_from_m(self, m: np.ndarray) -> np.ndarray:
        return self.weight * m.astype(np.float64)


SCORERS = {"byte4": BM25Float32, "exact": BM25Float64}


def make_scorer(norm_kind: str, doc_count: int, sum_total_tf: int,
                doc_freq: int, **kw):
    return SCORERS[norm_kind](doc_count, sum_total_tf, doc_freq, **kw)
