"""Competitive impacts: per-block Pareto frontier of (tf, norm-key) pairs.

Mirrors the reference's CompetitiveImpactAccumulator (reference:
core/src/java/org/apache/lucene/codecs/CompetitiveImpactAccumulator.java:64-123):
keep only pairs not dominated by another pair with freq >= and norm-key <=
(BM25 score is monotone increasing in tf, decreasing in the decoded length, and
both our norm-key encodings — SmallFloat byte and exact doc length — are
monotone in length). The block upper-bound score for a query is
max over frontier pairs of scorer.score(tf, key).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def impact_frontier(tfs: np.ndarray, keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Return the Pareto frontier (tf ascending, key strictly descending...
    actually: keys strictly increasing with tf, minimal set s.t. no kept pair
    is dominated by another pair having tf' >= tf and key' <= key)."""
    if len(tfs) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    order = np.lexsort((keys, -tfs))  # tf desc, key asc
    t = np.asarray(tfs, dtype=np.int64)[order]
    k = np.asarray(keys, dtype=np.int64)[order]
    # sweep from highest tf: keep a pair iff its key is strictly lower than
    # every key seen so far (those all have tf >= current tf)
    run_min = np.minimum.accumulate(k)
    keep = np.empty(len(k), dtype=bool)
    keep[0] = True
    keep[1:] = k[1:] < run_min[:-1]
    ft, fk = t[keep], k[keep]
    rev = np.argsort(ft, kind="stable")  # return tf ascending
    return ft[rev], fk[rev]
