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

All families run the float64 exact chain (norm key = exact doc length)
or the byte4 chain (key decodes through SmallFloat's LENGTH_TABLE like
the reference's norm decode). None factors into BM25's weight x
monotone-ratio form, so ``frontier_m`` returns the frontier's max SCORE
and ``scores_from_m`` is the identity — since r4 that bound drives the
PRUNED block-max path for every tf-monotone / dl-antitone family
(clamped-zero models use activity-based interval feasibility). Two
exceptions, each with its own mechanism:

* :class:`SweetSpot` — plateau length norm, NOT dl-antitone: bounds via
  the ``bound_array`` norm<=1 relaxation (still pruned);
* :class:`IndriDirichlet` — NEGATIVE log-probability scores:
  ``NEGATIVE_SCORE_MODELS`` routes it to the exhaustive path (additive
  bounds are invalid when absence out-scores presence — the same
  non-negativity assumption the reference's impacts contract makes).

Selection: set ``reader.similarity`` to ``("lmd", mu)``,
``("classic",)``, ``("sweetspot", lmin, lmax, steep, tf_base,
tf_min)``, ``("indri", mu)`` ... (None = BM25, the default) — the
per-searcher IndexSearcher.setSimilarity analogue, same contract as
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

    def bound_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        """Upper bound for (block max tf, block min key) pairs — exact for
        the tf-monotone / dl-antitone families; non-monotone length norms
        (SweetSpot) override with a valid relaxation."""
        return self.score_array(tfs, keys)


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


#: models whose scores can be negative (log-probabilities) — the WAND
#: block-max arithmetic, like the reference's impacts contract, assumes
#: non-negative per-clause scores, so the executor routes these to the
#: exhaustive path (a SHOULD clause's absence out-scores its presence,
#: which interval bound summation does not model)
NEGATIVE_SCORE_MODELS = frozenset({"indri"})


class IndriDirichlet(_LenDecode):
    """IndriDirichletSimilarity (core/src/java/org/apache/lucene/search/
    similarities/IndriDirichletSimilarity.java:55-60): ``score = boost *
    ln((tf + mu*p) / (dl + mu))`` with the default LM collection model
    ``p = (ttf+1)/(sumTotalTermFreq+1)`` (LMSimilarity.java:151-153).
    Unlike LMDirichlet there is NO zero clamp — SimilarityBase.score
    passes the raw value through, so scores are typically NEGATIVE (log
    of a probability); the executor therefore routes this model to the
    exhaustive path (NEGATIVE_SCORE_MODELS) — negative clause scores
    break the additive block-max bound (absence beats presence)."""

    may_be_negative = True

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int = 0, boost: float = 1.0,
                 mu: float = 2000.0):
        super().__init__(norm_kind)
        self.mu = float(mu)
        self.boost = float(boost)
        self.p_col = (total_tf + 1.0) / (sum_total_tf + 1.0)
        self._key = ("indri", norm_kind, doc_count, sum_total_tf,
                     total_tf, mu, boost)

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        dl = self.doc_len(keys)
        s = self.boost * np.log(
            (tf + self.mu * self.p_col) / (dl + self.mu)
        )
        return s.astype(self.dtype, copy=False)


class SweetSpot(_LenDecode):
    """SweetSpotSimilarity analogue (misc/src/java/org/apache/lucene/
    misc/SweetSpotSimilarity.java:110-147): Classic TF-IDF with

    * a plateau length norm —
      ``1/sqrt(steep*(|dl-lmin| + |dl-lmax| - (lmax-lmin)) + 1)``
      (= 1.0 for lmin <= dl <= lmax, sqrt falloff outside), and
    * ``baselineTf`` — ``freq <= tf_min ? tf_base :
      sqrt(freq + tf_base^2 - tf_min)`` (0 stays 0; :142-147).

    The plateau norm is NOT antitone in doc length (docs shorter than
    ``lmin`` are *penalized*), so the stored (max tf, min key) block
    extremes no longer locate the max score; :meth:`bound_array` /
    :meth:`ratio_array` therefore bound with the norm<=1 relaxation
    ``weight * baselineTf(tf)`` — always >= any in-block score, exact on
    blocks whose minimizing doc sits on the plateau.  Defaults
    (lmin=lmax=1, steep=0.5, tf_base=tf_min=0) degrade to Classic
    (SweetSpotSimilarity.java:102-104)."""

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int = 0, boost: float = 1.0,
                 ln_min: int = 1, ln_max: int = 1, steep: float = 0.5,
                 tf_base: float = 0.0, tf_min: float = 0.0):
        super().__init__(norm_kind)
        self.boost = float(boost)
        self.idf = np.log((doc_count + 1.0) / (doc_freq + 1.0)) + 1.0
        self.weight = self.boost * self.idf
        self.ln_min = float(ln_min)
        self.ln_max = float(ln_max)
        self.steep = float(steep)
        self.tf_min = float(tf_min)
        self.tf_base = float(tf_base)
        self.tf_add = float(tf_base) * float(tf_base) - float(tf_min)
        self._key = ("sweetspot", norm_kind, doc_count, doc_freq, boost,
                     ln_min, ln_max, steep, tf_base, tf_min)

    def _tf(self, tfs: np.ndarray) -> np.ndarray:
        t = tfs.astype(np.float64)
        out = np.where(t <= self.tf_min, self.tf_base,
                       np.sqrt(np.maximum(t + self.tf_add, 0.0)))
        return np.where(t == 0.0, 0.0, out)

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        dl = self.doc_len(keys)
        ln = 1.0 / np.sqrt(
            self.steep * (np.abs(dl - self.ln_min) + np.abs(dl - self.ln_max)
                          - (self.ln_max - self.ln_min)) + 1.0
        )
        s = (self._tf(tfs) * self.weight) * ln
        return s.astype(self.dtype, copy=False)

    # -- bounds: plateau norm <= 1 always, so weight * baselineTf(tf) is a
    # valid per-block upper bound regardless of which (tf, key) pairs the
    # Pareto frontier kept
    def bound_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        return (self._tf(tfs) * self.weight).astype(np.float64, copy=False)

    def ratio_array(self, tfs, keys) -> np.ndarray:
        return self.bound_array(tfs, keys)

    def max_score(self, frontier_tfs, frontier_keys) -> float:
        if len(frontier_tfs) == 0:
            return 0.0
        return float(self.bound_array(frontier_tfs, frontier_keys).max())

    def frontier_m(self, frontier_tfs, frontier_keys) -> float:
        return self.max_score(frontier_tfs, frontier_keys)


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


def _tfn_fn(normalization: str, c: float, doc_count: int,
            sum_total_tf: int, total_tf: int):
    """DFR/IB normalization component -> tfn(tf, dl) (Normalization.java
    subclasses, literal op order per file)."""
    avgdl = sum_total_tf / float(doc_count)
    if normalization == "h1":  # NormalizationH1.java:56-58
        return lambda tf, dl: tf * c * (avgdl / dl)
    if normalization == "h2":  # NormalizationH2.java:57-58
        return lambda tf, dl: tf * (np.log(1.0 + c * avgdl / dl) / _LOG_2)
    if normalization == "h3":  # NormalizationH3.java (mu = c; the
        # (ttf+1F)/(sumTF+1F) division happens in float32, kept)
        p32 = float(
            np.float32(np.float32(total_tf) + np.float32(1.0))
            / np.float32(np.float32(sum_total_tf) + np.float32(1.0))
        )
        return lambda tf, dl: (tf + c * p32) / (dl + c) * c
    if normalization == "z":  # NormalizationZ.java (z = c)
        return lambda tf, dl: tf * np.power(avgdl / dl, c)
    if normalization == "none":
        return lambda tf, dl: tf
    raise ValueError(f"unknown normalization {normalization!r}")


class DFR(_LenDecode):
    """Composable DFRSimilarity (DFRSimilarity.java:127-131): score =
    boost * basicModel(tfn, aeTimes1pTfn). Basic models g / if / in /
    ine (BasicModel*.java, aeTimes1pTfn-rewritten forms), after effects
    l / b (AfterEffect{L,B}.java), normalizations h1 / h2 / h3 / z /
    none."""

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int, basic: str = "in",
                 after: str = "l", normalization: str = "h2",
                 c: float = 1.0, boost: float = 1.0):
        super().__init__(norm_kind)
        self.boost = float(boost)
        self.tfn = _tfn_fn(normalization, float(c), doc_count,
                           sum_total_tf, total_tf)
        N, n, F = doc_count, doc_freq, total_tf
        if after == "l":  # AfterEffectL.java:32-34
            self.ae1p = 1.0
        elif after == "b":  # AfterEffectB.java:32-36 (F=ttf+1, n=df+1)
            self.ae1p = ((F + 1) + 1.0) / (n + 1)
        else:
            raise ValueError(f"unknown after effect {after!r}")
        if basic == "in":  # BasicModelIn.java:34-45
            A = np.log((N + 1.0) / (n + 0.5)) / _LOG_2
            self.model = lambda tfn, ae: A * ae * (1.0 - 1.0 / (1.0 + tfn))
        elif basic == "if":  # BasicModelIF.java (A over F)
            A = np.log(1.0 + (N + 1) / (F + 0.5)) / _LOG_2
            self.model = lambda tfn, ae: A * ae * (1.0 - 1.0 / (1.0 + tfn))
        elif basic == "ine":  # BasicModelIne.java (expected df)
            ne = N * (1.0 - np.power((N - 1) / float(N), float(F)))
            A = np.log((N + 1.0) / (ne + 0.5)) / _LOG_2
            self.model = lambda tfn, ae: A * ae * (1.0 - 1.0 / (1.0 + tfn))
        elif basic == "g":  # BasicModelG.java (geometric, lambda=F/(N+F))
            Fg = F + 1.0
            lam = Fg / (N + Fg)
            A = np.log(lam + 1.0) / _LOG_2
            Bv = np.log((1.0 + lam) / lam) / _LOG_2
            self.model = lambda tfn, ae: (Bv - (Bv - A) / (1.0 + tfn)) * ae
        else:
            raise ValueError(f"unknown basic model {basic!r}")
        self._key = ("dfr", basic, after, normalization, norm_kind,
                     doc_count, sum_total_tf, doc_freq, total_tf, c, boost)

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        dl = np.maximum(self.doc_len(keys), 1.0)
        s = self.boost * self.model(self.tfn(tf, dl), self.ae1p)
        return s.astype(self.dtype, copy=False)


class IB(_LenDecode):
    """Composable IBSimilarity (IBSimilarity.java:115-118): score =
    boost * distribution(tfn, lambda). Distributions ll / spl
    (Distribution{LL,SPL}.java incl. the SPL rounding guards), lambdas
    df / ttf (float32 casts kept, Lambda{DF,TTF}.java), normalizations
    as DFR."""

    def __init__(self, norm_kind: str, doc_count: int, sum_total_tf: int,
                 doc_freq: int, total_tf: int, distribution: str = "ll",
                 lam: str = "df", normalization: str = "h2",
                 c: float = 1.0, boost: float = 1.0):
        super().__init__(norm_kind)
        self.boost = float(boost)
        self.distribution = distribution
        self.tfn = _tfn_fn(normalization, float(c), doc_count,
                           sum_total_tf, total_tf)
        if lam == "df":  # LambdaDF.java:32-38
            lv = np.float32((doc_freq + 1.0) / (doc_count + 1.0))
            if lv == np.float32(1.0):
                lv = np.nextafter(lv, np.float32(0.0), dtype=np.float32)
        elif lam == "ttf":  # LambdaTTF.java:32-38
            lv = np.float32((total_tf + 1.0) / (doc_count + 1.0))
            if lv == np.float32(1.0):
                lv = np.nextafter(lv, np.float32(2.0), dtype=np.float32)
        else:
            raise ValueError(f"unknown lambda {lam!r}")
        self.lam = float(lv)
        if distribution not in ("ll", "spl"):
            raise ValueError(f"unknown distribution {distribution!r}")
        self._key = ("ib", distribution, lam, normalization, norm_kind,
                     doc_count, sum_total_tf, doc_freq, total_tf, c, boost)

    def score_array(self, tfs: np.ndarray, keys: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        dl = np.maximum(self.doc_len(keys), 1.0)
        tfn = self.tfn(tf, dl)
        if self.distribution == "ll":  # DistributionLL.java:33-35
            s = self.boost * -np.log(self.lam / (tfn + self.lam))
        else:  # DistributionSPL.java:35-59 with the rounding guards
            q = 1.0 - 1.0 / (tfn + 1.0)
            q = np.where(q == 1.0, np.nextafter(1.0, 0.0), q)
            powv = np.power(self.lam, q)
            bump = (
                np.nextafter(self.lam, np.inf)
                if self.lam < 1
                else np.nextafter(self.lam, 0.0)
            )
            powv = np.where(powv == self.lam, bump, powv)
            s = self.boost * -np.log((powv - self.lam) / (1.0 - self.lam))
        return s.astype(self.dtype, copy=False)


def DFRInL2(norm_kind, doc_count, sum_total_tf, doc_freq, total_tf,
            c=1.0, boost=1.0):
    """The common I(n)L2 configuration (kept as the ``dfr_inl2`` spec)."""
    return DFR(norm_kind, doc_count, sum_total_tf, doc_freq, total_tf,
               basic="in", after="l", normalization="h2", c=c, boost=boost)


def IBLLDFH2(norm_kind, doc_count, sum_total_tf, doc_freq, total_tf,
             c=1.0, boost=1.0):
    """The LL-DF-H2 configuration (kept as the ``ib_ll`` spec)."""
    return IB(norm_kind, doc_count, sum_total_tf, doc_freq, total_tf,
              distribution="ll", lam="df", normalization="h2", c=c,
              boost=boost)


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
    "indri": (IndriDirichlet, "mu", 2000.0),
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
    (name, param) with the model's single tunable (mu / lambda / c); the
    composable families take component names —
    ("dfr", basic, after, normalization[, c]) and
    ("ib", distribution, lambda, normalization[, c])."""
    name = sim[0]
    if name == "sweetspot":
        # ("sweetspot"[, ln_min, ln_max, steep, tf_base, tf_min])
        defaults = (1, 1, 0.5, 0.0, 0.0)
        p = tuple(sim[1:]) + defaults[len(sim) - 1:]
        return SweetSpot(norm_kind, doc_count, sum_total_tf, doc_freq,
                         total_tf, boost=boost, ln_min=p[0], ln_max=p[1],
                         steep=p[2], tf_base=p[3], tf_min=p[4])
    if name == "dfr" and len(sim) >= 4:
        return DFR(norm_kind, doc_count, sum_total_tf, doc_freq, total_tf,
                   basic=sim[1], after=sim[2], normalization=sim[3],
                   c=float(sim[4]) if len(sim) > 4 else 1.0, boost=boost)
    if name == "ib" and len(sim) >= 4:
        return IB(norm_kind, doc_count, sum_total_tf, doc_freq, total_tf,
                  distribution=sim[1], lam=sim[2], normalization=sim[3],
                  c=float(sim[4]) if len(sim) > 4 else 1.0, boost=boost)
    entry = _MODELS.get(name)
    if entry is None:
        raise ValueError(f"unknown similarity {sim!r}")
    cls, pname, default = entry
    kw = {"boost": boost}
    if pname is not None:
        kw[pname] = float(sim[1]) if len(sim) > 1 else default
    return cls(norm_kind, doc_count, sum_total_tf, doc_freq, total_tf, **kw)
