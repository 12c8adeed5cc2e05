"""Query-time join (reference: join module —
join/src/java/org/apache/lucene/search/join/JoinUtil.java): fromQuery hits
-> per-fromField-value aggregated score per ScoreMode -> every doc whose
toField holds one of those values, scored by the aggregate."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import parse_query
from lucene_ray.pipelines.build import IndexConfig
from lucene_ray.pipelines.oracle import OracleIndex

from test_engine_oracle import build_from_lists, make_corpus


@pytest.fixture(scope="module")
def join_index(tmp_path_factory, ray_session):
    doc_ids, texts = make_corpus(n_docs=220, seed=33)
    out = tmp_path_factory.mktemp("jq") / "idx"
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=4,
        heavy_df_threshold=64, sample_rate=1.0,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    oracle = OracleIndex(doc_ids, texts, analyzer="standard_en")
    return str(out), doc_ids, texts, oracle


def _model(oracle, an, qt, by_doc, mode, k):
    """Pure-python JoinUtil model: aggregate from-side scores per value,
    then rank every doc holding a value by (agg desc, doc asc)."""
    od, os_ = oracle.topk(parse_query(qt, an), 10**9)
    per_val = {}
    for d, s in zip(od.tolist(), os_.tolist()):
        per_val.setdefault(by_doc[d], []).append(s)
    agg = {}
    for v, ss in per_val.items():
        if mode == "none":
            agg[v] = 1.0
        elif mode == "max":
            agg[v] = max(ss)
        elif mode == "total":
            agg[v] = float(np.sum(ss))
        elif mode == "avg":
            agg[v] = float(np.sum(ss)) / len(ss)
    rows = sorted(
        ((agg[v], d) for d, v in by_doc.items() if v in agg),
        key=lambda p: (-p[0], p[1]),
    )[:k]
    return [d for _, d in rows], np.array([s for s, _ in rows])


@pytest.mark.parametrize("mode", ["none", "max", "total", "avg"])
def test_join_query_topk_all_modes(join_index, ray_session, mode):
    import ray.data

    from lucene_ray.pipelines.joins import join_query_topk

    out, doc_ids, texts, oracle = join_index
    src = [f"s{d % 9}" for d in doc_ids]
    by_doc = dict(zip(doc_ids, src))
    docs_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "source": pa.array(src, pa.string())})
    )
    an = make_analyzer("standard_en")
    for qt, k in [("alpha", 7), ("alpha beta", 12), ("zzz", 5)]:
        got = join_query_topk(
            out, qt, docs_ds, "source", "source", score_mode=mode, k=k
        ).to_pandas()
        want_docs, want_scores = _model(oracle, an, qt, by_doc, mode, k)
        assert got["doc_id"].tolist() == want_docs, (mode, qt)
        assert got["rank"].tolist() == list(range(1, len(want_docs) + 1))
        assert np.allclose(
            got["score"].to_numpy(), want_scores, rtol=1e-9, atol=1e-12
        ), (mode, qt)


def test_join_query_distinct_to_field(join_index, ray_session):
    """from and to fields differ: values collected from from_col, matched
    against to_col."""
    import ray.data

    from lucene_ray.pipelines.joins import join_query_topk

    out, doc_ids, texts, oracle = join_index
    src = [f"s{d % 9}" for d in doc_ids]
    dst = [f"s{(d + 1) % 9}" for d in doc_ids]  # shifted: different docs
    docs_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "f": pa.array(src, pa.string()),
                  "t": pa.array(dst, pa.string())})
    )
    an = make_analyzer("standard_en")
    got = join_query_topk(out, "alpha", docs_ds, "f", "t",
                          score_mode="max", k=10).to_pandas()
    od, os_ = oracle.topk(parse_query("alpha", an), 10**9)
    by_from = dict(zip(doc_ids, src))
    agg = {}
    for d, s in zip(od.tolist(), os_.tolist()):
        v = by_from[d]
        agg[v] = max(agg.get(v, -1.0), s)
    rows = sorted(
        ((agg[t], d) for d, t in zip(doc_ids, dst) if t in agg),
        key=lambda p: (-p[0], p[1]),
    )[:10]
    assert got["doc_id"].tolist() == [d for _, d in rows]


def test_asof_join_vs_bruteforce(ray_session):
    """As-of join == brute per-row scan: latest same-key right row with
    ts <= left ts; rows with no earlier right match drop; ties on right
    ts resolve to the last arrival."""
    import random

    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.joins import asof_join

    rng = random.Random(11)
    nl, nr = 120, 90
    lt = pa.table(
        {
            "lid": pa.array(range(nl), pa.int64()),
            "user_id": pa.array(
                [rng.randint(0, 9) for _ in range(nl)], pa.int64()
            ),
            "ts": pa.array(
                [rng.randint(0, 50) for _ in range(nl)], pa.int64()
            ),
        }
    )
    rt = pa.table(
        {
            "rid": pa.array(range(nr), pa.int64()),
            "user_id": pa.array(
                [rng.randint(0, 9) for _ in range(nr)], pa.int64()
            ),
            "ts": pa.array(
                [rng.randint(0, 50) for _ in range(nr)], pa.int64()
            ),
            "val": pa.array(
                [rng.random() for _ in range(nr)], pa.float64()
            ),
        }
    )
    out = asof_join(
        ray.data.from_arrow(lt),
        ray.data.from_arrow(rt),
        key="user_id",
        ts="ts",
        num_buckets=8,
        right_order="rid",
    ).take_all()
    got = {r["lid"]: (r["r_rid"], r["r_ts"]) for r in out}

    # brute force (tie on right ts -> largest rid via right_order)
    want = {}
    for i in range(nl):
        u, t = lt["user_id"][i].as_py(), lt["ts"][i].as_py()
        best = None
        for j in range(nr):
            if rt["user_id"][j].as_py() == u and rt["ts"][j].as_py() <= t:
                k = (rt["ts"][j].as_py(), j)
                if best is None or k >= best:
                    best = k
        if best is not None:
            want[i] = (best[1], best[0])
    assert got == want
