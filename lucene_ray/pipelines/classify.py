"""Classification module analogues: Naive Bayes and kNN (MLT-vote).

Reference: ``classification/src/java/org/apache/lucene/classification/``

* ``SimpleNaiveBayesClassifier.java`` — per class C:
  ``score = ln(docFreq(C)) - ln(docsWithClass)
           + sum_{token w} ln((hits(w,C) + 1) / den(C))`` where
  ``hits(w,C)`` is the number of docs of class C containing w
  (:214-216, a count query, NOT a term frequency), and
  ``den(C) = avgUniqueTermsPerDoc * docFreq(C) + docsWithClass``
  (:240-253, ``getTextTermFreqForClass``: sumDocFreq/docCount * docFreq).
  Predicted class = argmax (the 0-1 normalisation of
  ``normClassificationResults`` is monotone, so the argmax — and the
  reported raw log-joint — are unchanged by skipping it).
* ``KNearestNeighborClassifier.java`` — MLT query from the source text,
  top-k retrieval, per-class score ``sum_i(score_i / maxScore) /
  min(k, n_hits)`` (buildListFromTopDocs :190-236 with the sumdoc < k
  correction), argmax wins. The reference breaks exact ties in HashMap
  iteration order; we pin (score desc, class asc) so both the engine and
  the DuckDB oracle are deterministic.

Ray-Data-native shape (NB): training is ONE tokenizing ``map_batches``
pass emitting pre-aggregated (term, class, doc-count) partials into a
``groupby(term, class)`` — the only shuffle — plus a column-pruned
``groupby(class).count()`` for priors. The aggregated model (vocab x
n_classes, the small side: bounded like a searcher's term dictionary) is
broadcast once via ``ray.put``; classification is a stateless
``map_batches`` over the test docs. At vocabularies too big to broadcast,
swap the attach for the doc-bucket groupby exchange used in
pipelines/dedup.py (documented lever, same semantics).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data


def train_naive_bayes(
    docs_ds: "ray.data.Dataset",
    text_col: str = "text",
    class_col: str = "lang",
    id_col: str = "doc_id",
    analyzer_name: str = "en_nostem_simple",
    model_dir: Optional[str] = None,
    min_hits: int = 1,
) -> dict:
    """Aggregate the NB sufficient statistics into a model.

    ``model_dir=None`` (small-vocab path): gather the aggregated
    (term, class, hits) table onto the driver as
    ``{classes, prior, den, hits: term -> int64[n_classes]}``.

    ``model_dir=<path>`` (web-scale path): the aggregated table is
    WRITTEN TO PARQUET straight from the shuffle — the driver holds only
    the (n_classes)-sized priors/denominators; each classifier actor
    loads the model table once in ``__init__``. Driver RSS stays flat in
    the vocabulary size.

    ``min_hits`` is an optional df-floor feature selection (drop
    (term, class) rows with hits < min_hits) — the standard NB
    vocabulary-pruning move; collection stats (``den``, priors) are
    computed BEFORE the floor so min_hits=1 is bit-identical to no
    floor. Predictions under a floor treat pruned terms as unseen
    (hits=0 smoothing), exactly as if the term were absent from class C
    at train time."""
    from ..functions.analysis import make_analyzer

    def partial(batch: pa.Table) -> pa.Table:
        an = make_analyzer(analyzer_name)
        counts: Dict[Tuple[str, str], int] = {}
        classes = batch.column(class_col).to_pylist()
        for text, cls in zip(batch.column(text_col).to_pylist(), classes):
            for term in set(an.analyze(text or "")):
                key = (term, cls)
                counts[key] = counts.get(key, 0) + 1
        terms = list(counts)
        return pa.table(
            {
                "term": pa.array([t for t, _ in terms], pa.string()),
                "cls": pa.array([c for _, c in terms], pa.string()),
                "hits_part": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        docs_ds.select_columns([id_col, text_col, class_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["term", "cls"])
        .aggregate(ray.data.aggregate.Sum("hits_part", alias_name="hits"))
    )
    cls_rows = (
        docs_ds.select_columns([class_col]).groupby(class_col).count().take_all()
    )
    classes = sorted(r[class_col] for r in cls_rows)
    dfc = np.array(
        [next(r["count()"] for r in cls_rows if r[class_col] == c) for c in classes],
        dtype=np.float64,
    )
    n_docs = float(dfc.sum())
    meta = {"classes": classes, "analyzer": analyzer_name}
    if model_dir is not None:
        # web-scale path: model table never touches the driver — sink the
        # shuffle output to parquet, read it back for the (scalar) sum_df.
        # Clear first: write_parquet appends uniquely-named files, so a
        # retrain into the same dir would read stale+new rows together
        import shutil

        shutil.rmtree(model_dir, ignore_errors=True)
        agg.write_parquet(model_dir)
        model_ds = ray.data.read_parquet(model_dir)
        # (the min_hits floor is applied at actor load time — sum_df and
        # den stay collection-level, reference getTextTermFreqForClass)
        sum_df = model_ds.sum("hits")
        avg_unique = float(sum_df) / n_docs
        meta.update(
            prior=np.log(dfc) - np.log(n_docs),
            den=avg_unique * dfc + n_docs,
            model_dir=model_dir,
            min_hits=min_hits,
        )
        return meta
    cidx = {c: i for i, c in enumerate(classes)}
    hits: Dict[str, np.ndarray] = {}
    sum_df = 0
    for r in agg.take_all():
        v = hits.get(r["term"])
        if v is None:
            v = hits[r["term"]] = np.zeros(len(classes), dtype=np.int64)
        v[cidx[r["cls"]]] = r["hits"]
        sum_df += int(r["hits"])
    avg_unique = sum_df / n_docs
    if min_hits > 1:
        hits = {
            t: np.where(v >= min_hits, v, 0)
            for t, v in hits.items()
            if (v >= min_hits).any()
        }
    meta.update(
        prior=np.log(dfc) - np.log(n_docs),
        den=avg_unique * dfc + n_docs,
        hits=hits,
    )
    return meta


def naive_bayes_classify(
    model: dict,
    test_ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 8),
):
    """Assign each test doc its argmax class (score desc, class asc).
    -> Dataset(doc_id, pred_cls, score[raw log-joint, float64]).

    Small models (``hits`` dict present) broadcast via ``ray.put``;
    parquet-sunk models (``model_dir``) are loaded ONCE PER ACTOR in the
    stage's ``__init__`` — the driver never materializes the vocabulary."""
    meta = {k: v for k, v in model.items() if k != "hits"}
    hits_ref = ray.put(model.get("hits"))

    class _Classify:
        def __init__(self):
            from ..functions.analysis import make_analyzer

            self.an = make_analyzer(meta["analyzer"])
            self.classes = meta["classes"]
            self.prior = meta["prior"]
            self.den = meta["den"]
            nc = len(self.classes)
            hits = ray.get(hits_ref)
            if hits is None:
                import pyarrow.parquet as pq

                tbl = pq.read_table(
                    meta["model_dir"], columns=["term", "cls", "hits"]
                )
                cidx = {c: i for i, c in enumerate(self.classes)}
                floor = int(meta.get("min_hits", 1))
                hits = {}
                h_np = tbl.column("hits").to_numpy()
                for t, c, h in zip(
                    tbl.column("term").to_pylist(),
                    tbl.column("cls").to_pylist(),
                    h_np,
                ):
                    if h < floor:
                        continue
                    v = hits.get(t)
                    if v is None:
                        v = hits[t] = np.zeros(nc, dtype=np.int64)
                    v[cidx[c]] = h
            self.hits = hits
            self.zero = np.zeros(nc, dtype=np.int64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            classes, prior, den, hits = (
                self.classes, self.prior, self.den, self.hits,
            )
            nc = len(classes)
            zero = self.zero
            preds: List[str] = []
            scores = np.empty(len(batch), dtype=np.float64)
            for i, text in enumerate(batch.column(text_col).to_pylist()):
                toks = self.an.analyze(text or "")
                if toks:
                    terms, occ = np.unique(
                        np.asarray(toks, dtype=object), return_counts=True
                    )
                    h = np.stack([hits.get(str(t), zero) for t in terms])
                    # sum over tokens of ln((hits+1)/den): occ-weighted dot
                    ll = occ.astype(np.float64) @ np.log((h + 1.0) / den)
                else:
                    ll = np.zeros(nc)
                s = prior + ll
                j = int(np.argmax(s))  # first max = lexicographically smallest
                preds.append(classes[j])
                scores[i] = s[j]
            return pa.table(
                {
                    "doc_id": batch.column(id_col),
                    "pred_cls": pa.array(preds, pa.string()),
                    "score": pa.array(scores),
                }
            )

    # autoscaling actor pool: model load happens once per actor, and the
    # per-batch scoring is CPU-bound — size `concurrency` to the cluster
    return test_ds.select_columns([id_col, text_col]).map_batches(
        _Classify, batch_format="pyarrow", concurrency=concurrency
    )


def knn_classify(
    index_dir: str,
    texts: Dict[int, str],  # query_id -> source text
    class_lookup: pa.Table,  # (doc_id, <class_col>) — stored-fields analogue
    class_col: str = "lang",
    k: int = 10,
    min_tf: int = 2,
    min_df: int = 5,
    max_terms: int = 25,
) -> pa.Table:
    """KNearestNeighborClassifier: MLT term selection + SHOULD retrieval,
    then the reference's normalized-score class vote over the top-k.
    -> pyarrow.Table(query_id, pred_cls, score) — queries whose MLT
    selection is empty (no retrievable terms) yield no row, matching the
    reference's null assignment."""
    from ..functions.analysis import make_analyzer
    from ..functions.query import BooleanQuery, score_blockmax
    from .mlt import interesting_terms
    from .search import get_reader

    reader = get_reader(index_dir)
    an = make_analyzer(reader.analyzer_name)
    ids = class_lookup.column("doc_id").to_numpy()
    order = np.argsort(ids)
    ids_sorted = ids[order]
    cls_sorted = np.asarray(class_lookup.column(class_col).to_pylist(), dtype=object)[
        order
    ]
    qids, preds, scores = [], [], []
    for qid in sorted(texts):
        sel = interesting_terms(
            reader, texts[qid], an, min_tf=min_tf, min_df=min_df,
            max_terms=max_terms,
        )
        if not sel:
            continue
        q = BooleanQuery(must=(), should=tuple(t for t, _ in sel), must_not=())
        docs, s = score_blockmax(reader, q, k)
        if len(docs) == 0:
            continue
        max_score = float(s[0])
        pos = np.searchsorted(ids_sorted, docs)
        cls = cls_sorted[pos]
        sumdoc = len(docs)  # every hit has a class value here
        per_class: Dict[str, float] = {}
        for c, sc in zip(cls, s):
            per_class[c] = per_class.get(c, 0.0) + float(sc) / max_score
        div = float(min(k, sumdoc))
        best = min(
            ((-v / div, c) for c, v in per_class.items())
        )  # (score desc, class asc)
        qids.append(qid)
        preds.append(best[1])
        scores.append(-best[0])
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "pred_cls": pa.array(preds, pa.string()),
            "score": pa.array(scores, pa.float64()),
        }
    )
