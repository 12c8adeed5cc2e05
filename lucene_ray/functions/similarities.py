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


_LOG_2 = float(np.log(2.0))


class _LenDecode:
    def __init__(self, norm_kind: str):
        self.norm_kind = norm_kind
        self.dtype = np.float32 if norm_kind == "byte4" else np.float64

    def doc_len(self, keys: np.ndarray) -> np.ndarray:
        if self.norm_kind == "byte4":
            return LENGTH_TABLE[keys.astype(np.int64)].astype(np.float64)
        return keys.astype(np.float64)

    # -- generic protocol pieces derived from score_array ------------------
    def cache_key(self):
        return self._key

    def ratio_key(self):
        # the cached block bound IS the score for these models -> the key
        # must be term-specific (includes df/ttf), unlike BM25's shared
        # weight x ratio factorization
        return self._key

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

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        dl = self.doc_len(keys)
        s = self.boost * (
            np.log(1.0 + tf / (self.mu * self.p_col))
            + np.log(self.mu / (dl + self.mu))
        )
        return np.maximum(s, 0.0).astype(self.dtype, copy=False)


class ClassicTFIDF(_LenDecode):
    """ClassicSimilarity (TF-IDF) analogue (per-term scorer instance)."""

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int = 0, boost: float = 1.0):
        super().__init__(norm_kind)
        self.boost = float(boost)
        self.idf = np.log((doc_count + 1.0) / (doc_freq + 1.0)) + 1.0
        self.weight = self.boost * self.idf
        self._key = ("classic", norm_kind, doc_count, doc_freq, boost)

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = np.sqrt(tfs.astype(np.float64))
        dl = self.doc_len(keys)
        with np.errstate(divide="ignore"):
            norm = 1.0 / np.sqrt(dl)
        s = (tf * self.weight) * norm
        return s.astype(self.dtype, copy=False)


class LMJelinekMercer(_LenDecode):
    """LMJelinekMercerSimilarity (LMJelinekMercerSimilarity.java:68-74):
    ``score = boost * log(1 + ((1-lambda)*freq/dl) / (lambda*p))`` with
    the default collection model p (LMSimilarity.java:151-153)."""

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int, lam: float = 0.1,
                 boost: float = 1.0):
        super().__init__(norm_kind)
        if not (0.0 < lam <= 1.0):
            raise ValueError(f"illegal lambda value: {lam}")
        self.lam = float(lam)
        self.boost = float(boost)
        self.p_col = (total_tf + 1.0) / (sum_total_tf + 1.0)
        self._key = ("lmjm", norm_kind, doc_count, sum_total_tf, doc_freq,
                     total_tf, lam, boost)

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        dl = np.maximum(self.doc_len(keys), 1.0)
        s = self.boost * np.log(
            1.0 + ((1.0 - self.lam) * tf / dl) / (self.lam * self.p_col)
        )
        return s.astype(self.dtype, copy=False)


class DFRInL2(_LenDecode):
    """DFRSimilarity(BasicModelIn, AfterEffectL, NormalizationH2(c)) —
    the common I(n)L2 configuration. tfn = freq * log2(1 + c*avgdl/dl)
    (NormalizationH2.java:57-58); AfterEffectL contributes 1
    (AfterEffectL.java:32-34); score = boost * A * (1 - 1/(1+tfn)) with
    A = log2((N+1)/(n+0.5)) (BasicModelIn.java:34-45)."""

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int, c: float = 1.0,
                 boost: float = 1.0):
        super().__init__(norm_kind)
        self.c = float(c)
        self.boost = float(boost)
        self.avgdl = sum_total_tf / float(doc_count)
        self.A = np.log((doc_count + 1.0) / (doc_freq + 0.5)) / _LOG_2
        self._key = ("dfr_inl2", norm_kind, doc_count, sum_total_tf,
                     doc_freq, c, boost)

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        dl = np.maximum(self.doc_len(keys), 1.0)
        tfn = tf * (np.log(1.0 + self.c * self.avgdl / dl) / _LOG_2)
        s = self.boost * (self.A * (1.0 - 1.0 / (1.0 + tfn)))
        return s.astype(self.dtype, copy=False)


class IBLLDFH2(_LenDecode):
    """IBSimilarity(DistributionLL, LambdaDF, NormalizationH2(c)):
    lambda = float32((df+1)/(N+1)) (LambdaDF.java:32-38, float cast kept);
    tfn as NormalizationH2; score = boost * -log(lambda/(tfn+lambda))
    (DistributionLL.java:33-35)."""

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int, c: float = 1.0,
                 boost: float = 1.0):
        super().__init__(norm_kind)
        self.c = float(c)
        self.boost = float(boost)
        self.avgdl = sum_total_tf / float(doc_count)
        lam = np.float32((doc_freq + 1.0) / (doc_count + 1.0))
        if lam == np.float32(1.0):
            lam = np.nextafter(lam, np.float32(0.0), dtype=np.float32)
        self.lam = float(lam)
        self._key = ("ib_ll", norm_kind, doc_count, sum_total_tf, doc_freq,
                     c, boost)

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        dl = np.maximum(self.doc_len(keys), 1.0)
        tfn = tf * (np.log(1.0 + self.c * self.avgdl / dl) / _LOG_2)
        s = self.boost * -np.log(self.lam / (tfn + self.lam))
        return s.astype(self.dtype, copy=False)


class DFIStandardized(_LenDecode):
    """DFISimilarity(IndependenceStandardized): expected =
    (ttf+1)*dl/(sumTF+1); 0 when freq <= expected, else
    boost * log2((freq-expected)/sqrt(expected) + 1)
    (DFISimilarity.java:70-81, IndependenceStandardized.java:34)."""

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int, boost: float = 1.0):
        super().__init__(norm_kind)
        self.boost = float(boost)
        self.total_tf = int(total_tf)
        self.sum_total_tf = int(sum_total_tf)
        self._key = ("dfi", norm_kind, doc_count, sum_total_tf, doc_freq,
                     total_tf, boost)

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        dl = self.doc_len(keys)
        expected = (self.total_tf + 1) * dl / (self.sum_total_tf + 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            measure = (tf - expected) / np.sqrt(expected)
            s = self.boost * (np.log(measure + 1.0) / _LOG_2)
        s = np.where(tf <= expected, 0.0, s)
        return s.astype(self.dtype, copy=False)


class AxiomaticF2EXP(_LenDecode):
    """AxiomaticF2EXP (Axiomatic.java:107-117 + AxiomaticF2EXP.java:59-85):
    ``score = max(0, boost * (freq/(freq + s + s*dl/avgdl))
    * ((N+1)/df)^k)`` with float32 hyperparams s=0.25, k=0.35 (kept as
    their float32 values, like the reference's float fields)."""

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int = 0, s: float = 0.25,
                 k: float = 0.35, boost: float = 1.0):
        super().__init__(norm_kind)
        self.s = float(np.float32(s))
        self.k = float(np.float32(k))
        self.boost = float(boost)
        self.avgdl = sum_total_tf / float(doc_count)
        self.idf = ((doc_count + 1.0) / doc_freq) ** self.k
        self._key = ("axiomatic_f2exp", norm_kind, doc_count, sum_total_tf,
                     doc_freq, self.s, self.k, boost)

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        dl = self.doc_len(keys)
        tfln = tf / (tf + self.s + self.s * dl / self.avgdl)
        s = self.boost * (tfln * self.idf)
        return np.maximum(s, 0.0).astype(self.dtype, copy=False)


class BooleanSim(_LenDecode):
    """BooleanSimilarity (BooleanSimilarity.java:50-52): every matching
    term scores its boost, no statistics."""

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int = 0, boost: float = 1.0):
        super().__init__(norm_kind)
        self.boost = float(boost)
        self._key = ("boolean", norm_kind, boost)

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        return np.full(len(tfs), self.boost, dtype=self.dtype)


_MODELS = {
    "lmd": (LMDirichlet, "mu", 2000.0),
    "lmjm": (LMJelinekMercer, "lam", 0.1),
    "dfr_inl2": (DFRInL2, "c", 1.0),
    "ib_ll": (IBLLDFH2, "c", 1.0),
    "dfi": (DFIStandardized, None, None),
    "classic": (ClassicTFIDF, None, None),
    "boolean": (BooleanSim, None, None),
    "axiomatic_f2exp": (AxiomaticF2EXP, "s", 0.25),
}


def make_similarity(sim, norm_kind: str, doc_count: int, sum_total_tf: int,
                    doc_freq: int, total_tf: int, boost: float = 1.0):
    """Factory for a ``reader.similarity`` spec tuple: (name,) or
    (name, param) with the model's single tunable (mu / lambda / c)."""
    name = sim[0]
    entry = _MODELS.get(name)
    if entry is None:
        raise ValueError(f"unknown similarity {sim!r}")
    cls, pname, default = entry
    kw = {"boost": boost}
    if pname is not None:
        kw[pname] = float(sim[1]) if len(sim) > 1 else default
    return cls(norm_kind, doc_count, sum_total_tf, doc_freq, total_tf, **kw)
