"""Block join — parent/child doc blocks (Lucene join module).

Reference: ``join/src/java/org/apache/lucene/search/join/
ToParentBlockJoinQuery.java`` (child hits aggregated to the enclosing
parent under a ScoreMode), ``ToChildBlockJoinQuery.java`` (parent score
propagated to every child), ``ScoreMode.java`` (None/Avg/Max/Total/Min),
``CheckJoinIndex.java`` (block-structure validation).

Lucene requires parent and children to be indexed CONTIGUOUSLY in one
segment (``IndexWriter.addDocuments`` doc blocks, children first, parent
last) and finds the enclosing parent with a parents BitSet. The Ray-Data-
native equivalent of that invariant is the doc-ID encoding

    child_doc_id = (parent_id << CHILD_SHIFT) | chunk_index

which keeps all children of one parent contiguous in global doc-ID order
inside the child index — the enclosing parent is recovered arithmetically
(``doc_id >> CHILD_SHIFT``), no BitSet sidecar needed, and the per-parent
aggregation below is a segment-local ``reduceat`` over the doc-sorted
score array (children of one parent never straddle a shard boundary as
long as shards split on parent boundaries — guaranteed here because doc
IDs of one parent share the high bits).

Children are derived deterministically: the parent's token stream (same
regexp the SQL-parity analyzer uses) chopped into ``chunk_size``-token
chunks — the "sentences" of the synthetic corpus.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data

CHILD_SHIFT = 16
_TOKEN_RE = re.compile(r"[a-z0-9]+")

SCORE_MODES = ("max", "total", "avg")


def child_docs_ds(
    ds: "ray.data.Dataset", chunk_size: int = 16
) -> "ray.data.Dataset":
    """Row-expanding map: each parent document -> its token chunks as
    child docs (doc_id = (parent << CHILD_SHIFT) | chunk). Streaming, no
    shuffle; parents longer than 2**CHILD_SHIFT chunks are rejected."""

    def expand(batch: pa.Table) -> pa.Table:
        pids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out_ids: List[int] = []
        out_text: List[str] = []
        for pid, text in zip(pids.tolist(), texts):
            toks = _TOKEN_RE.findall(text.lower())
            nchunks = (len(toks) + chunk_size - 1) // chunk_size
            if nchunks >= (1 << CHILD_SHIFT):
                raise ValueError(f"parent {pid}: too many chunks")
            for c in range(nchunks):
                out_ids.append((pid << CHILD_SHIFT) | c)
                out_text.append(
                    " ".join(toks[c * chunk_size : (c + 1) * chunk_size])
                )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "text": pa.array(out_text, pa.string()),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        expand, batch_format="pyarrow"
    )


def build_child_index(
    ds: "ray.data.Dataset",
    out_dir: str,
    chunk_size: int = 16,
    analyzer: str = "en_nostem_simple",
    num_partitions: int = 8,
) -> str:
    """Build the child (chunk) index for block joins. The child count is
    computed by the same streaming pass that emits the chunks."""
    from .build import IndexConfig, build_index

    children = child_docs_ds(ds, chunk_size=chunk_size).materialize()
    build_index(
        children,
        out_dir,
        IndexConfig(
            analyzer=analyzer,
            norm_kind="exact",
            num_partitions=num_partitions,
        ),
        doc_count=children.count(),
    )
    return out_dir


def _child_hits(reader, query_str: str, analyzer: str):
    """All matching child docs + scores (exhaustive, deletes applied)."""
    from ..functions.analysis import make_analyzer
    from ..functions.query import _exhaustive_candidates, parse_query

    q = parse_query(query_str, make_analyzer(analyzer))
    got = _exhaustive_candidates(reader, q)
    if got is None:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    cand, acc, _ = got
    keep = acc > 0
    return cand[keep], acc[keep].astype(np.float64, copy=False)


def to_parent_join(
    reader,
    query_str: str,
    score_mode: str = "max",
    k: int = 10,
    analyzer: str = "en_nostem_simple",
) -> Tuple[np.ndarray, np.ndarray]:
    """ToParentBlockJoinQuery analogue: child hits -> enclosing parents,
    parent score = max/total/avg of its matching children's scores
    (reference ScoreMode semantics; Avg = Total / matching-child count).
    -> (parents, scores) top-k by (score desc, parent asc)."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    docs, scores = _child_hits(reader, query_str, analyzer)
    if len(docs) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    parents = docs >> CHILD_SHIFT
    # docs ascending => parents grouped contiguously (doc-block invariant)
    uniq, starts = np.unique(parents, return_index=True)
    if score_mode == "max":
        agg = np.maximum.reduceat(scores, starts)
    else:
        # ascending-doc-ID summation order (the reference iterates child
        # docs in order within the block)
        agg = np.add.reduceat(scores, starts)
        if score_mode == "avg":
            counts = np.diff(np.append(starts, len(scores)))
            agg = agg / counts
    order = np.lexsort((uniq, -agg))[:k]
    return uniq[order], agg[order]


def to_child_join(
    parent_reader,
    parent_query: str,
    chunk_counts: "object",
    k_parents: int = 5,
    analyzer: str = "en_nostem_simple",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ToChildBlockJoinQuery analogue: parents matching ``parent_query``
    (top ``k_parents`` by BM25) expand to ALL their children, each child
    carrying the parent's score (the reference propagates the parent
    score unchanged to every child in the block).

    ``chunk_counts`` is the per-parent chunk-count DOC-VALUES column
    (:class:`lucene_ray.state.docvalues.DocValues` for the ``n_chunks``
    field written by :func:`write_chunk_count_doc_values`) — block
    structure lives in the index itself, exactly like the reference's
    parents BitSet (``join/.../ToChildBlockJoinQuery.java`` resolves
    children from in-index structure, never from caller-side state).
    Only the ``k_parents`` hits are gathered — driver-side state is O(k).
    -> (child_ids, parents, scores), children in (parent rank, chunk)
    order."""
    from ..functions.analysis import make_analyzer
    from ..functions.query import parse_query, score_exhaustive

    q = parse_query(parent_query, make_analyzer(analyzer))
    pdocs, pscores = score_exhaustive(parent_reader, q, k_parents)
    nchunks = chunk_counts.values_for(pdocs.astype(np.int64, copy=False))
    kids: List[np.ndarray] = []
    pids: List[np.ndarray] = []
    scs: List[np.ndarray] = []
    for pid, ps, n in zip(pdocs.tolist(), pscores.tolist(), nchunks.tolist()):
        n = int(n)
        if n == 0:
            continue
        c = (np.int64(pid) << CHILD_SHIFT) | np.arange(n, dtype=np.int64)
        kids.append(c)
        pids.append(np.full(n, pid, dtype=np.int64))
        scs.append(np.full(n, ps, dtype=np.float64))
    if not kids:
        e = np.empty(0, np.int64)
        return e, e.copy(), np.empty(0, np.float64)
    return np.concatenate(kids), np.concatenate(pids), np.concatenate(scs)


N_CHUNKS_FIELD = "n_chunks"


def chunk_counts_ds(
    ds: "ray.data.Dataset", chunk_size: int = 16
) -> "ray.data.Dataset":
    """Streaming (doc_id, n_chunks) per parent — no shuffle, no driver
    materialization; feeds the doc-values sidecar below."""

    def counts(batch: pa.Table) -> pa.Table:
        pids = batch.column("doc_id")
        texts = batch.column("text").to_pylist()
        n = [
            (len(_TOKEN_RE.findall(t.lower())) + chunk_size - 1) // chunk_size
            for t in texts
        ]
        return pa.table({"doc_id": pids, "n_chunks": pa.array(n, pa.int64())})

    return ds.select_columns(["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow"
    )


def write_chunk_count_doc_values(
    ds: "ray.data.Dataset", index_dir: str, chunk_size: int = 16
) -> None:
    """Persist per-parent chunk counts as a numeric doc-values field
    (``n_chunks``) on the PARENT index, so ToChild expansion reads block
    structure from the index — the reference keeps it in the index too
    (its parents BitSet / doc blocks). Streaming write, idempotent per
    index dir (write_doc_values' wipe-and-rewrite discipline)."""
    from ..state.docvalues import write_doc_values

    write_doc_values(
        chunk_counts_ds(ds, chunk_size=chunk_size),
        index_dir,
        N_CHUNKS_FIELD,
        value_col="n_chunks",
    )


def check_join_index(reader) -> None:
    """CheckJoinIndex analogue: every child doc ID in the index must
    decode to a (parent, chunk) pair with chunk < 2**CHILD_SHIFT and the
    children of each parent must form a dense chunk range starting at 0
    (the doc-block invariant)."""
    docs = np.asarray(reader.all_doc_ids(), dtype=np.int64)
    if len(docs) == 0:
        return
    parents = docs >> CHILD_SHIFT
    chunks = docs & ((1 << CHILD_SHIFT) - 1)
    uniq, starts = np.unique(parents, return_index=True)
    ends = np.append(starts[1:], len(docs))
    for s, e in zip(starts.tolist(), ends.tolist()):
        got = chunks[s:e]
        if not np.array_equal(got, np.arange(e - s)):
            raise ValueError(
                f"broken doc block for parent {int(parents[s])}: "
                f"chunks {got.tolist()[:8]}..."
            )
