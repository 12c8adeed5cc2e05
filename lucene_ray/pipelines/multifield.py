"""Multi-field documents: per-field inverted indexes + field-scoped search.

Reference analogue: Lucene's document model is field-centric — a Document
is a bag of (field, value) pairs, the postings dictionary keys on
(field, term) (``index/FieldInfos.java``, per-field ``Terms`` via
``codecs/...FieldsProducer``), norms / docCount / sumTotalTermFreq are
maintained PER FIELD (``search/CollectionStatistics.java`` takes a field),
and queries address a field (``TermQuery(new Term("title", "foo"))``).
``MultiFieldQueryParser`` (queryparser/.../classic/MultiFieldQueryParser
.java) expands an unscoped clause into a disjunction over the default
fields; the classic parser's ``field:term`` syntax scopes a single clause.

Ray-Data-first mapping: one subindex per field under
``<root>/fields/<name>/`` — each built by the ordinary ``build_index``
pipeline over that field's column (its own postings, norms, per-field
doc_count / sum_total_tf / avgdl — exactly the reference's per-field
stats), all sharing the corpus-global doc IDs so cross-field score
combination is a sorted-array merge with no remapping. Building per field
re-reads only that field's column (column-pruned parquet scans), which at
100 TB is strictly cheaper than one pass carrying every field's tokens
through a single fatter shuffle; the per-field builds are independent Ray
pipelines and can run concurrently.

Scoring model (Lucene BooleanQuery over per-field TermQuery clauses):
every matching (field, term) clause contributes its per-field BM25 score;
the doc's score is the sum. An unscoped MUST term becomes a required-OR
group across the default fields (``+(title:t body:t)`` — exactly what
MultiFieldQueryParser builds); an unscoped MUST_NOT excludes a doc that
contains the term in ANY default field.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, replace
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

MF_MANIFEST = "multifield.json"
_ROLES = ("must", "should", "must_not")


def field_dir(root: str, field: str) -> str:
    return os.path.join(root, "fields", field)


def build_multifield_index(
    ds,
    out_dir: str,
    fields: Dict[str, str],
    config,
    doc_count: Optional[int] = None,
    default_fields: Optional[Sequence[str]] = None,
):
    """Build one subindex per field (``fields`` maps field name -> column
    of ``ds``) and write the root manifest. ``config`` is the shared
    IndexConfig; each field's build overrides ``text_col``. The input
    Dataset is lazily re-executed per field — each pass materializes only
    (id_col, that field's column)."""
    from .build import build_index

    os.makedirs(out_dir, exist_ok=True)
    for name, col in sorted(fields.items()):
        cfg = replace(config, text_col=col)
        build_index(
            ds.select_columns([config.id_col, col]),
            field_dir(out_dir, name),
            cfg,
            doc_count=doc_count,
        )
    manifest = {
        "version": 1,
        "fields": sorted(fields),
        "default_fields": list(default_fields or sorted(fields)),
    }
    tmp = os.path.join(out_dir, MF_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, MF_MANIFEST))
    return manifest


class MultiFieldReader:
    """Per-field IndexReaders sharing the global doc-ID space."""

    def __init__(self, root: str):
        from ..state.reader import IndexReader

        self.root = root
        with open(os.path.join(root, MF_MANIFEST)) as f:
            meta = json.load(f)
        self.fields: List[str] = meta["fields"]
        self.default_fields: List[str] = meta["default_fields"]
        self._readers: Dict[str, IndexReader] = {}
        self._reader_cls = IndexReader

    def reader(self, field: str):
        r = self._readers.get(field)
        if r is None:
            if field not in self.fields:
                raise KeyError(f"unknown field {field!r}; have {self.fields}")
            r = self._reader_cls(field_dir(self.root, field))
            self._readers[field] = r
        return r


@dataclass(frozen=True)
class MultiFieldQuery:
    """Flat multi-field boolean: ``scoped`` = (field, term, role) clauses
    (role in must/should/must_not); ``groups`` = required-OR groups of
    (field, term) pairs (each group must match at least once; every
    matching member scores — the reference's nested
    ``+(f1:t f2:t)``)."""

    scoped: Tuple[Tuple[str, str, str], ...] = ()
    groups: Tuple[Tuple[Tuple[str, str], ...], ...] = ()


def parse_multifield(
    text: str, analyzer, default_fields: Sequence[str]
) -> MultiFieldQuery:
    """``field:term`` scopes a clause; bare terms search every default
    field (SHOULD-disjunction); ``+term`` requires the term in at least
    one default field (required-OR group); ``-term`` excludes docs
    containing it in ANY default field. ``+field:term`` / ``-field:term``
    scope the requirement/exclusion to one field. Terms run through the
    same analyzer as indexing; a token analyzing to nothing (stopword) is
    dropped (a dropped MUST imposes no constraint — Lucene parser
    behavior)."""
    scoped: List[Tuple[str, str, str]] = []
    groups: List[Tuple[Tuple[str, str], ...]] = []
    for raw in text.split():
        role = "should"
        if raw.startswith("+"):
            role, raw = "must", raw[1:]
        elif raw.startswith("-") and len(raw) > 1:
            role, raw = "must_not", raw[1:]
        field = None
        if ":" in raw:
            field, raw = raw.split(":", 1)
            if field not in default_fields and not field.islower():
                raise ValueError(f"bad field in clause {field}:{raw}")
        for term in analyzer.analyze(raw):
            if field is not None:
                scoped.append((field, term, role))
            elif role == "must":
                groups.append(tuple((f, term) for f in default_fields))
            else:
                scoped.extend((f, term, role) for f in default_fields)
    return MultiFieldQuery(scoped=tuple(scoped), groups=tuple(groups))


def _scored_pair(mf: MultiFieldReader, field: str, term: str, k1, b):
    """(docs, scores) of one (field, term) via that field's reader —
    per-field df / avgdl / doc_count, warm-reader scored-list cache."""
    from ..functions.bm25 import make_scorer
    from ..functions.query import LruDict, TermCursor

    r = mf.reader(field)
    df, _ = r.term_stats(term)
    if df == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    scorer = make_scorer(
        r.norm_kind, r.doc_count, r.sum_total_tf, df, k1=k1, b=b
    )
    cur = TermCursor(
        term,
        r.postings(term),
        scorer,
        r.__dict__.setdefault("_scored_full", LruDict(512)),
        deleted=getattr(r, "deleted", None),
    )
    return cur.decode_all()


def _docs_of(pairs: Sequence[Tuple[np.ndarray, np.ndarray]]) -> np.ndarray:
    ds = [d for d, _ in pairs if len(d)]
    if not ds:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(ds))


def _isin_sorted(values: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    if len(sorted_set) == 0 or len(values) == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.minimum(np.searchsorted(sorted_set, values), len(sorted_set) - 1)
    return sorted_set[pos] == values


def _field_doclens(mf: MultiFieldReader, field: str):
    """(sorted doc_ids, doc_lens) of one field from its docmap sidecar,
    cached on the field's reader (warm searcher state). Docs absent from
    the sidecar (no kept tokens in this field) have length 0."""
    import glob

    import pyarrow.parquet as pq

    r = mf.reader(field)
    cached = r.__dict__.get("_dl_map")
    if cached is None:
        files = sorted(
            glob.glob(os.path.join(r.index_dir, "docmap", "*.parquet"))
        )
        if not files:
            raise FileNotFoundError(
                f"combined-field scoring needs the docmap sidecar "
                f"(IndexConfig.emit_doc_map) under {r.index_dir}"
            )
        tabs = [
            pq.read_table(f, columns=["doc_id", "doc_len"]) for f in files
        ]
        ids = np.concatenate(
            [t.column("doc_id").to_numpy() for t in tabs]
        ).astype(np.int64)
        lens = np.concatenate(
            [t.column("doc_len").to_numpy() for t in tabs]
        ).astype(np.float64)
        order = np.argsort(ids, kind="stable")
        cached = (ids[order], lens[order])
        r.__dict__["_dl_map"] = cached
    return cached


def _raw_postings(mf: MultiFieldReader, field: str, term: str):
    """(docs, tfs) of one (field, term) in global doc order (raw term
    frequencies, pre-similarity)."""
    r = mf.reader(field)
    parts = r.postings(term)
    if not parts:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    ds, ts = [], []
    for tp in parts:
        d, t, _ = tp.decode_all()
        ds.append(d)
        ts.append(t)
    return np.concatenate(ds).astype(np.int64), np.concatenate(ts)


def search_combined(
    mf: MultiFieldReader,
    terms: Sequence[str],
    weights: Dict[str, float],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """CombinedFieldQuery / BM25F-simple (reference:
    search/CombinedFieldQuery.java — "a single BM25 score ... across all
    the fields as if their content had been indexed in a single combined
    field", Robertson's BM25F simple variant): per term,
    tf' = sum_f w_f * tf_f, dl' = sum_f w_f * dl_f (the reference's
    MultiNormsLeafSimScorer weighted-norm sum), df' = |docs containing
    the term in ANY weighted field|, avgdl' = sum_f w_f *
    sumTotalTermFreq_f / docCount (the pseudo CollectionStatistics);
    score = BM25(tf', dl', avgdl', idf(df')). Multiple terms sum
    (SHOULD). -> (doc_ids, scores) top-k, (score desc, doc asc)."""
    from ..functions.query import _topk_from

    fields = sorted(weights)
    r0 = mf.reader(fields[0])
    n_docs = int(r0.doc_count)
    avgdl = (
        sum(weights[f] * mf.reader(f).sum_total_tf for f in fields) / n_docs
    )
    cand: Optional[np.ndarray] = None
    acc: Optional[np.ndarray] = None
    for term in dict.fromkeys(terms):
        per_field = [(f, *_raw_postings(mf, f, term)) for f in fields]
        union = _docs_of([(d, d) for _, d, _ in per_field])
        if len(union) == 0:
            continue
        tfc = np.zeros(len(union), dtype=np.float64)
        dlc = np.zeros(len(union), dtype=np.float64)
        for f, d, t in per_field:
            if len(d):
                np.add.at(
                    tfc, np.searchsorted(union, d), weights[f] * t
                )
            ids, lens = _field_doclens(mf, f)
            if len(ids):
                pos = np.minimum(
                    np.searchsorted(ids, union), len(ids) - 1
                )
                hit = ids[pos] == union
                dlc[hit] += weights[f] * lens[pos[hit]]
        df = len(union)
        idf = np.log(1 + (n_docs - df + 0.5) / (df + 0.5))
        scores = idf * (
            tfc / (tfc + k1 * ((1 - b) + b * dlc / avgdl))
        )
        if cand is None:
            cand, acc = union, scores
        else:
            merged = np.union1d(cand, union)
            newacc = np.zeros(len(merged), dtype=np.float64)
            np.add.at(newacc, np.searchsorted(merged, cand), acc)
            np.add.at(newacc, np.searchsorted(merged, union), scores)
            cand, acc = merged, newacc
    if cand is None:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    return _topk_from(cand, acc, k)


def search_multifield(
    mf: MultiFieldReader,
    query: MultiFieldQuery,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Exhaustive cross-field executor -> (doc_ids, scores) top-k under
    (score desc, doc asc). Candidates = union of scoring clauses' docs;
    score = sum of every matching clause's per-field BM25 — each distinct
    (field, term) scoring pair counted ONCE (the single-field executor's
    ``sorted(set(...))`` dedupe convention); constraints: each scoped MUST
    clause's docs intersect, each required-OR group's union intersects,
    MUST_NOT docs subtract."""
    from ..functions.query import _topk_from

    memo: Dict[Tuple[str, str], Tuple[np.ndarray, np.ndarray]] = {}

    def pair_of(fld: str, term: str):
        p = memo.get((fld, term))
        if p is None:
            p = _scored_pair(mf, fld, term, k1, b)
            memo[(fld, term)] = p
        return p

    scoring_keys: Dict[Tuple[str, str], None] = {}
    must_sets: List[np.ndarray] = []
    not_pairs: List[Tuple[np.ndarray, np.ndarray]] = []
    for fld, term, role in query.scoped:
        pair = pair_of(fld, term)
        if role == "must_not":
            not_pairs.append(pair)
            continue
        scoring_keys[(fld, term)] = None
        if role == "must":
            if len(pair[0]) == 0:
                return (
                    np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64),
                )
            must_sets.append(pair[0])
    for grp in query.groups:
        pairs = [pair_of(f, t) for f, t in dict.fromkeys(grp)]
        union = _docs_of(pairs)
        if len(union) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        scoring_keys.update((ft, None) for ft in dict.fromkeys(grp))
        must_sets.append(union)
    scoring = [pair_of(f, t) for f, t in scoring_keys]
    if not scoring:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    cand = _docs_of(scoring)
    acc = np.zeros(len(cand), dtype=np.float64)
    for docs, scores in scoring:
        if len(docs):
            np.add.at(acc, np.searchsorted(cand, docs), scores)
    keep = np.ones(len(cand), dtype=bool)
    for ms in must_sets:
        keep &= _isin_sorted(cand, ms)
    not_docs = _docs_of(not_pairs)
    if len(not_docs):
        keep &= ~_isin_sorted(cand, not_docs)
    cand, acc = cand[keep], acc[keep]
    return _topk_from(cand, acc, k)
