"""Search-quality evaluation: precision@N, recall, AvP (MAP), MRR.

Reference: the benchmark quality package
(``benchmark/src/java/org/apache/lucene/benchmark/quality/`` —
``QualityBenchmark.java`` runs each judged query through the searcher and
feeds ranks to ``QualityStats.java``; ``Judge``/``TrecJudge`` supply the
relevance sets). Faithful metric semantics (QualityStats.java:76-140):

* ``precision@n`` — relevant-in-top-n / n; when fewer than ``n`` results
  were returned the reference extrapolates ``numPoints*pAt[numPoints]/n``
  (:113-117), which algebraically equals relevant-found / n — one
  uniform formula.
* ``recall`` — relevant-found / relevant-existing; a query with ZERO
  judged-relevant docs degrades to the last running precision (:100),
  i.e. 0.
* ``avp`` — sum of the running precision at each relevant rank, divided
  by relevant-existing (:88-94,121-124): the standard average precision.
* ``mrr`` — 1/rank of the FIRST relevant hit, but only when that rank is
  <= 5; otherwise 0 (:87-90 — the reference's explicit top-5 window).

The reference's ``QualityStats.average`` cross-query roll-up divides the
summed per-query AvPs by the SUMMED maxGoodPoints (:169-186) — a quirk
this module deliberately leaves to callers; per-query rows are returned.

Ray-native shape: the judged query set is an eval-suite (small, bounded);
searches run on the warm reader and every metric is a vectorized numpy
pass over the top-k ranks — nothing corpus-sized moves. Relevance sets
come from the caller (e.g. ``matching_docs`` of a judge query — the
TrecJudge analogue backed by the index instead of a qrels file).
"""

from __future__ import annotations

from typing import Dict, Iterable, Sequence, Tuple

import numpy as np
import pyarrow as pa


def quality_stats(
    ranked_docs: np.ndarray,
    relevant: np.ndarray,
    p_points: Sequence[int] = (1, 5, 10, 20),
) -> dict:
    """QualityStats for ONE query: ``ranked_docs`` in rank order (the
    top-k), ``relevant`` a sorted array of judged-relevant doc IDs."""
    n_pts = int(len(ranked_docs))
    max_good = int(len(relevant))
    if n_pts:
        pos = np.minimum(
            np.searchsorted(relevant, ranked_docs), max(max_good - 1, 0)
        )
        rel = (
            relevant[pos] == ranked_docs
            if max_good
            else np.zeros(n_pts, dtype=bool)
        )
    else:
        rel = np.zeros(0, dtype=bool)
    good_at = np.cumsum(rel.astype(np.int64))
    num_good = int(good_at[-1]) if n_pts else 0
    # running precision after each returned rank (float64, one division
    # per rank — the oracle mirrors COUNT(...)/rank row-wise)
    prec = (
        good_at.astype(np.float64) / np.arange(1, n_pts + 1, dtype=np.float64)
        if n_pts
        else np.empty(0, np.float64)
    )
    out = {"num_points": n_pts, "num_good": num_good, "max_good": max_good}
    for n in p_points:
        # uniform formula: relevant within top-min(n, numPoints) over n —
        # equals the reference's extrapolation for n > numPoints
        cnt = int(good_at[min(n, n_pts) - 1]) if n_pts else 0
        out[f"p_at_{n}"] = cnt / float(n)
    if max_good > 0:
        out["recall"] = num_good / float(max_good)
        # rank-ascending sequential fold (np.add.reduce == the oracle's
        # ordered list_reduce)
        out["avp"] = float(np.add.reduce(prec[rel])) / float(max_good)
    else:
        out["recall"] = (num_good / float(n_pts)) if n_pts else 0.0
        out["avp"] = 0.0
    first = np.flatnonzero(rel)
    r0 = int(first[0]) + 1 if len(first) else 0
    out["mrr"] = 1.0 / r0 if 0 < r0 <= 5 else 0.0
    return out


def quality_benchmark(
    index_dir: str,
    judged: Dict[int, Tuple[str, Iterable[int]]],
    k: int = 20,
    p_points: Sequence[int] = (1, 5, 10, 20),
) -> pa.Table:
    """QualityBenchmark.execute analogue: run every judged query through
    the pruned executor at ``k`` (the reference's maxResults) and emit
    one QualityStats row per query.

    ``judged``: ``{query_id: (query_text, relevant_doc_ids)}``.
    -> Table(query_id, num_points, num_good, max_good, p_at_*, recall,
    avp, mrr) — floats rounded 6 dp at the boundary.
    """
    from ..functions.analysis import make_analyzer
    from ..functions.query import parse_query, score_blockmax
    from ..functions.rounding import round_half_away
    from .search import get_reader

    reader = get_reader(index_dir)
    an = make_analyzer(reader.analyzer_name)
    rows = []
    for qid, (text, relevant) in sorted(judged.items()):
        rel = np.unique(np.asarray(list(relevant), dtype=np.int64))
        d, _s = score_blockmax(reader, parse_query(text, an), k)
        st = quality_stats(np.asarray(d, dtype=np.int64), rel, p_points)
        st["query_id"] = qid
        rows.append(st)
    cols: Dict[str, pa.Array] = {
        "query_id": pa.array([r["query_id"] for r in rows], pa.int64()),
        "num_points": pa.array([r["num_points"] for r in rows], pa.int64()),
        "num_good": pa.array([r["num_good"] for r in rows], pa.int64()),
        "max_good": pa.array([r["max_good"] for r in rows], pa.int64()),
    }
    # half-away rounding in lockstep with the SQL oracle's round()
    for n in p_points:
        cols[f"p_at_{n}"] = pa.array(
            round_half_away(
                np.asarray([r[f"p_at_{n}"] for r in rows], np.float64), 6
            ),
            pa.float64(),
        )
    for m in ("recall", "avp", "mrr"):
        cols[m] = pa.array(
            round_half_away(
                np.asarray([r[m] for r in rows], np.float64), 6
            ),
            pa.float64(),
        )
    return pa.table(cols)
