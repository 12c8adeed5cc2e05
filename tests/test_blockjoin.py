"""Block join (join module: ToParentBlockJoinQuery / ToChildBlockJoinQuery
analogues; reference join/src/java/org/apache/lucene/search/join/).

Brute-force checked: children re-derived in python, child BM25 recomputed
from first principles over the chunk corpus, parent aggregation compared
per ScoreMode.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pytest

TEXTS = [
    "data stream over the data stream window spark group query row data "
    "slow small filter customer line the batch value merge line table",
    "hash join order batch stream spark window window dup key fast",
    "plain data row hash join hash join hash join customer value",
    "the a of and to",  # stopword-only parent -> children with dl 0
    "stream",
]
CHUNK = 4
_TOK = re.compile(r"[a-z0-9]+")
_STOPS = {
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
}


def _children(texts):
    out = {}  # (parent, chunk) -> kept tokens
    for pid, t in enumerate(texts):
        toks = _TOK.findall(t.lower())
        n = (len(toks) + CHUNK - 1) // CHUNK
        for c in range(n):
            kept = [
                w for w in toks[c * CHUNK : (c + 1) * CHUNK]
                if w not in _STOPS
            ]
            out[(pid, c)] = kept
    return out


def _brute_child_scores(children, terms, k1=1.2, b=0.75):
    n_docs = len(children)
    dls = {k: len(v) for k, v in children.items()}
    sum_tf = sum(dls.values())
    avgdl = sum_tf / n_docs
    dfs = {}
    for t in terms:
        dfs[t] = sum(1 for v in children.values() if t in v)
    out = {}
    for key, toks in children.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0 or dfs[t] == 0:
                continue
            idf = math.log(1 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * (tf / (tf + k1 * ((1 - b) + b * dls[key] / avgdl)))
        if s > 0:
            out[key] = s
    return out


@pytest.fixture(scope="module")
def child_index(ray_session, tmp_path_factory):
    import ray.data

    from lucene_ray.pipelines.blockjoin import build_child_index

    out = str(tmp_path_factory.mktemp("bj") / "child_idx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
        }
    )
    build_child_index(
        ray.data.from_arrow(docs), out, chunk_size=CHUNK, num_partitions=3
    )
    return out


@pytest.mark.parametrize("mode", ["max", "total", "avg"])
@pytest.mark.parametrize("qs", ["hash join", "data stream", "spark"])
def test_to_parent_join_modes(child_index, qs, mode):
    from lucene_ray.pipelines.blockjoin import to_parent_join
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(child_index)
    p, s = to_parent_join(reader, qs, score_mode=mode, k=10)
    children = _children(TEXTS)
    cs = _brute_child_scores(children, qs.split())
    per_parent = {}
    for (pid, _c), sc in cs.items():
        per_parent.setdefault(pid, []).append(sc)
    if mode == "max":
        want = {pid: max(v) for pid, v in per_parent.items()}
    elif mode == "total":
        want = {pid: sum(v) for pid, v in per_parent.items()}
    else:
        want = {pid: sum(v) / len(v) for pid, v in per_parent.items()}
    got = dict(zip(p.tolist(), s.tolist()))
    assert got == pytest.approx(want)
    # rank order: (score desc, parent asc)
    order = sorted(want, key=lambda x: (-want[x], x))
    assert p.tolist() == order[:10]


def test_check_join_index(child_index):
    from lucene_ray.pipelines.blockjoin import check_join_index
    from lucene_ray.pipelines.search import get_reader

    check_join_index(get_reader(child_index))


class _CountingDV:
    """DocValues proxy counting how many doc IDs get gathered — the O(k)
    driver-state assertion: ToChild must look up only the top-k parents,
    never materialize a corpus-sized count map."""

    def __init__(self, dv):
        self._dv = dv
        self.gathered = 0

    def values_for(self, docs):
        self.gathered += len(docs)
        return self._dv.values_for(docs)


def test_to_child_join_propagates_parent_score(ray_session, tmp_path):
    import ray.data

    from lucene_ray.pipelines.blockjoin import (
        CHILD_SHIFT,
        N_CHUNKS_FIELD,
        to_child_join,
        write_chunk_count_doc_values,
    )
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.state.docvalues import DocValues

    out = str(tmp_path / "parent_idx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
        }
    )
    ds = ray.data.from_arrow(docs)
    build_index(
        ds,
        out,
        IndexConfig(
            analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2
        ),
        doc_count=len(TEXTS),
    )
    reader = get_reader(out)
    write_chunk_count_doc_values(ds, out, chunk_size=CHUNK)
    counts = _CountingDV(DocValues(out, N_CHUNKS_FIELD))
    k_parents = 3
    kids, parents, scores = to_child_join(reader, "hash join", counts,
                                          k_parents)
    assert len(kids) > 0
    # driver-side gather is O(k): exactly the top-k parents, nothing else
    assert counts.gathered <= k_parents
    # every child decodes back to its parent, chunks dense from 0
    assert np.array_equal(kids >> CHILD_SHIFT, parents)
    expect_n = {
        pid: (len(_TOK.findall(t.lower())) + CHUNK - 1) // CHUNK
        for pid, t in enumerate(TEXTS)
    }
    for pid in np.unique(parents):
        got = np.sort(kids[parents == pid] & ((1 << CHILD_SHIFT) - 1))
        assert np.array_equal(got, np.arange(expect_n[int(pid)]))
    # children of one parent all share the parent's score
    for pid in np.unique(parents):
        assert len(set(scores[parents == pid].tolist())) == 1
