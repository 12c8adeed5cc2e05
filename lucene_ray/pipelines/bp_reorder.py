"""BP doc reordering: recursive graph bisection for postings locality.

Reference: ``misc/src/java/org/apache/lucene/misc/index/
BPIndexReorderer.java`` (:94-420) implementing Dhulipala et al.,
"Compressing Graphs and Indexes with Recursive Graph Bisection"
(KDD'16): reorder documents so that docs sharing terms sit close
together — doc-gap deltas shrink and FOR/PFor posting blocks compress
better. The reference runs it per merging segment, consuming
``O(maxDoc + numTerms * numThreads)`` memory (:92); this module keeps
the same contract — the incidence for ONE reorder unit (a segment-sized
chunk) is held in RAM, while the surrounding Ray pipeline (term-df
aggregation, analyzer passes, the reordered rebuild) streams.

Algorithm (faithful shape):

* recursively halve the doc sequence (stop at ``min_partition_size``,
  the reference's guard :244);
* per level, up to ``max_iters`` swap rounds: each doc's bias is
  ``sum over its terms of log2(df_other_side) - log2(df_own_side)``
  (computeBias — zero df contributes 0), both halves sort by bias
  descending and the top pairs swap while the pair's combined bias
  exceeds the iteration index — the paper's annealing tweak the
  reference keeps ("comparing the gain ... against `iter` rather than
  zero", :395-400);
* terms outside ``[min_df, max_df_frac * n_docs]`` are ignored
  (DEFAULT_MIN_DOC_FREQ / maxDocFreq — ubiquitous and vanishing terms
  carry no locality signal).

Everything is vectorized: per-side dfs via ``bincount`` over CSR
slices, per-doc biases via scatter-adds — no Python loop over docs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _gather(indptr: np.ndarray, flat: np.ndarray, docs: np.ndarray):
    """CSR slice gather: (values, per-doc lengths) for ``docs``."""
    from ..util import concat_aranges

    lengths = (indptr[docs + 1] - indptr[docs]).astype(np.int64)
    idx = np.repeat(indptr[docs], lengths) + concat_aranges(lengths)
    return flat[idx], lengths


def _log2z(x: np.ndarray) -> np.ndarray:
    return np.where(x > 0, np.log2(np.maximum(x, 1)), 0.0)


def bp_permutation(
    indptr: np.ndarray,
    flat_terms: np.ndarray,
    n_terms: int,
    max_iters: int = 20,
    min_partition_size: int = 32,
    max_depth: int = 24,
) -> np.ndarray:
    """-> permutation ``perm`` (doc INDICES in their new order) for the
    CSR doc->term incidence (``indptr`` len n_docs+1, ``flat_terms``
    term ids)."""
    n_docs = len(indptr) - 1

    def side_bias(docs, df_own, df_other):
        vals, lengths = _gather(indptr, flat_terms, docs)
        per_occ = _log2z(df_other[vals]) - _log2z(df_own[vals])
        bias = np.zeros(len(docs), dtype=np.float64)
        np.add.at(bias, np.repeat(np.arange(len(docs)), lengths), per_occ)
        return bias

    def bisect(seg: np.ndarray, depth: int) -> np.ndarray:
        if len(seg) < 2 * min_partition_size or depth >= max_depth:
            return seg
        half = len(seg) // 2
        left, right = seg[:half].copy(), seg[half:].copy()
        for it in range(max_iters):
            tl, _ = _gather(indptr, flat_terms, left)
            tr, _ = _gather(indptr, flat_terms, right)
            df_l = np.bincount(tl, minlength=n_terms)
            df_r = np.bincount(tr, minlength=n_terms)
            bias_l = side_bias(left, df_l, df_r)
            bias_r = side_bias(right, df_r, df_l)
            o_l = np.argsort(-bias_l, kind="stable")
            o_r = np.argsort(-bias_r, kind="stable")
            m = min(len(left), len(right))
            gains = bias_l[o_l[:m]] + bias_r[o_r[:m]]
            n_swap = int(np.searchsorted(-gains, -float(it), side="left"))
            if n_swap == 0:
                break
            li, ri = o_l[:n_swap], o_r[:n_swap]
            left[li], right[ri] = right[ri].copy(), left[li].copy()
        return np.concatenate(
            [bisect(left, depth + 1), bisect(right, depth + 1)]
        )

    return bisect(np.arange(n_docs, dtype=np.int64), 0)


def log_gap_cost(indptr: np.ndarray, flat_terms: np.ndarray,
                 n_terms: int, order: np.ndarray) -> float:
    """The objective BP minimizes: sum over terms of sum(log2(gap + 1))
    over consecutive doc gaps in the given order — the bit-cost model of
    delta-encoded postings (KDD'16 §2)."""
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    docs = np.repeat(
        np.arange(len(indptr) - 1), np.diff(indptr).astype(np.int64)
    )
    r = rank[docs]
    o = np.lexsort((r, flat_terms))
    t_s, r_s = flat_terms[o], r[o]
    same = np.r_[False, t_s[1:] == t_s[:-1]]
    gaps = np.where(same, r_s - np.r_[0, r_s[:-1]], r_s + 1)
    return float(np.log2(gaps + 1.0).sum())


def bp_reorder_index(
    ds: "object",
    out_dir: str,
    cfg=None,
    min_df: int = 2,
    max_df_frac: float = 0.5,
    max_iters: int = 20,
    min_partition_size: int = 32,
) -> Tuple[dict, dict]:
    """Build a BP-reordered index from a text Dataset: one distributed
    term-df aggregation picks the locality-bearing terms, one analyzer
    pass emits the (doc, term-id) incidence (gathered in RAM for the
    reorder unit — the reference's own memory contract), the permutation
    ranks become a sort column and the existing index-time-sort pipeline
    rebuilds (orig_id doc values carry external identities).

    Returns (manifest, stats) with the log-gap objective before/after.
    """
    import pyarrow as pa

    import ray
    import ray.data

    from .build import IndexConfig
    from .sorted_index import build_sorted_index
    from .stats import term_stats

    cfg = cfg or IndexConfig()
    n_docs = ds.count()
    st = term_stats(ds, cfg)
    hi = max(int(max_df_frac * n_docs), min_df)
    kept = [
        r["term"]
        for r in st.take_all()  # vocab-bounded (a searcher-sized table)
        if min_df <= int(r["doc_freq"]) <= hi
    ]
    term_id = {t: i for i, t in enumerate(sorted(kept))}
    tid_ref = ray.put(term_id)
    analyzer_name = cfg.analyzer

    def incidence(batch: pa.Table) -> pa.Table:
        from ..functions.analysis import make_analyzer

        tmap = ray.get(tid_ref)
        an = make_analyzer(analyzer_name)
        out_d, out_t = [], []
        for d, text in zip(
            batch.column(cfg.id_col).to_pylist(),
            batch.column(cfg.text_col).to_pylist(),
        ):
            for tok in set(an.analyze(text or "")):
                tid = tmap.get(tok)
                if tid is not None:
                    out_d.append(d)
                    out_t.append(tid)
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "tid": pa.array(out_t, pa.int32()),
            }
        )

    pairs = (
        ds.select_columns([cfg.id_col, cfg.text_col])
        .map_batches(incidence, batch_format="pyarrow")
        .take_all()  # the reorder unit's incidence — RAM-bounded like
        # the reference's ForwardIndex (O(postings) per segment)
    )
    doc_ids = np.asarray([r["doc_id"] for r in pairs], dtype=np.int64)
    tids = np.asarray([r["tid"] for r in pairs], dtype=np.int64)
    uniq_docs = np.unique(doc_ids)
    dpos = np.searchsorted(uniq_docs, doc_ids)
    o = np.lexsort((tids, dpos))
    dpos_s, tids_s = dpos[o], tids[o]
    counts = np.bincount(dpos_s, minlength=len(uniq_docs))
    indptr = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    perm = bp_permutation(
        indptr, tids_s, len(term_id), max_iters=max_iters,
        min_partition_size=min_partition_size,
    )
    stats = {
        "cost_before": log_gap_cost(
            indptr, tids_s, len(term_id), np.arange(len(uniq_docs))
        ),
        "cost_after": log_gap_cost(indptr, tids_s, len(term_id), perm),
        "n_docs": int(n_docs),
        "n_terms": len(term_id),
    }
    # rank per ORIGINAL doc id (docs with no kept terms go last, id-asc)
    rank = np.full(len(uniq_docs), -1, dtype=np.int64)
    rank[perm] = np.arange(len(perm))
    rank_of = dict(zip(uniq_docs.tolist(), rank.tolist()))
    n_ranked = len(uniq_docs)
    rank_ref = ray.put(rank_of)

    def attach_rank(batch: pa.Table) -> pa.Table:
        rmap = ray.get(rank_ref)
        ids = batch.column(cfg.id_col).to_pylist()
        ranks = [
            rmap.get(d, n_ranked + d) for d in ids
        ]  # docs with no kept terms: stable id-ordered tail
        return batch.append_column(
            "bp_rank", pa.array(ranks, pa.int64())
        )

    ranked = ds.map_batches(attach_rank, batch_format="pyarrow")
    manifest = build_sorted_index(
        ranked, out_dir, cfg, sort_col="bp_rank", doc_count=int(n_docs)
    )
    return manifest, stats
