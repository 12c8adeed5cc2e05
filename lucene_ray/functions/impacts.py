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


def impact_frontiers_bulk(tfs: np.ndarray, keys: np.ndarray, sizes: np.ndarray):
    """Per-block Pareto frontiers for MANY consecutive blocks in one pass.

    ``sizes[b]`` is block b's length; blocks partition ``tfs``/``keys`` in
    order. One global lexsort by (block, tf desc, key asc); the per-block
    running minimum is computed with a single ``minimum.accumulate`` by
    offsetting each block's keys so earlier blocks sit strictly ABOVE later
    ones (the accumulate can then never carry a minimum across a block
    boundary). Result per block == :func:`impact_frontier` exactly.
    """
    nb = len(sizes)
    out = []
    if nb == 0:
        return out
    t = np.asarray(tfs, dtype=np.int64)
    k = np.asarray(keys, dtype=np.int64)
    block_id = np.repeat(np.arange(nb, dtype=np.int64), sizes)
    order = np.lexsort((k, -t, block_id))
    kb = k[order]
    tb = t[order]
    span = int(k.max()) + 1 if len(k) else 1
    offs = (np.int64(nb - 1) - block_id[order]) * np.int64(span)
    kk = kb + offs
    run_min = np.minimum.accumulate(kk)
    keep = np.empty(len(kk), dtype=bool)
    if len(kk):
        keep[0] = True
        keep[1:] = kk[1:] < run_min[:-1]
    kept_block = block_id[order][keep]
    kept_t = tb[keep]
    kept_k = kb[keep]
    bounds = np.searchsorted(kept_block, np.arange(nb + 1))
    for b in range(nb):
        lo, hi = bounds[b], bounds[b + 1]
        # kept run is tf desc / key asc within the block; reverse -> tf asc
        out.append((kept_t[lo:hi][::-1].copy(), kept_k[lo:hi][::-1].copy()))
    return out
