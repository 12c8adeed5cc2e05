"""MemoryIndex: a single-document, in-RAM index exposing the full
IndexReader protocol, so ANY query kernel (BM25/boolean, phrase/sloppy,
multi-term, spans, intervals, term automata, payload queries, every
similarity) can score one ephemeral document without touching disk.

Reference: memory/src/java/org/apache/lucene/index/memory/MemoryIndex.java
(addField -> per-term postings in sorted hash slices, createSearcher over a
single-doc LeafReader; used by the monitor module's CandidateMatcher to run
the *real* query against each candidate document,
monitor/src/java/org/apache/lucene/monitor/QueryMatch.java path).

Fidelity contract: the document is inverted with the SAME analyzer chain,
norm computation (SmallFloat byte4 of the kept-token count,
functions/smallfloat.py) and postings codec (encode_term_postings /
parse_term_postings, state/segment.py) as a disk build, and the collection
stats are exactly those of a one-doc index (doc_count=1, sum_total_tf=dl).
Scores are therefore bit-identical to building a real one-doc index and
searching it — asserted by tests/test_memory_index.py across query shapes
and similarities.

Scale note: MemoryIndex is the per-record state of a streaming verify
stage (one instance per candidate doc inside ``map_batches``); it holds
one document's vocabulary and never concatenates across docs, so the
monitor's exact-verify pass stays an embarrassingly parallel map with no
shuffle at any corpus size.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..functions.smallfloat import int_to_byte4
from .segment import TermPostings, encode_term_postings, parse_term_postings


class _MemDocValues:
    """Single-doc numeric doc-values shim (state/docvalues.py DocValues
    surface consumed by filter_docs / score_sort_by_field / FeatureQuery)."""

    def __init__(self, doc_id: int, value):
        self._doc = int(doc_id)
        self._has = value is not None
        self._val = 0 if value is None else value

    @property
    def doc_sorted_ids(self) -> np.ndarray:
        if not self._has:
            return np.empty(0, dtype=np.int64)
        return np.asarray([self._doc], dtype=np.int64)

    def values_for(self, docs) -> np.ndarray:
        docs = np.asarray(docs, dtype=np.int64)
        if isinstance(self._val, str):
            out = np.full(len(docs), "", dtype=object)
        else:
            out = np.zeros(len(docs), dtype=np.int64)
        if self._has:
            out[docs == self._doc] = self._val
        return out

    def range_docs(self, lo: int, hi: int) -> np.ndarray:
        if self._has and not isinstance(self._val, str) and lo <= self._val <= hi:
            return self.doc_sorted_ids
        return np.empty(0, dtype=np.int64)

    def in_set_docs(self, values) -> np.ndarray:
        if self._has and self._val in set(values):
            return self.doc_sorted_ids
        return np.empty(0, dtype=np.int64)


class MemoryIndex:
    """One document, fully queryable. Build from raw text (analyzed here)
    or from pre-analyzed tokens (``from_tokens`` — the monitor verify path
    re-uses the presearch stage's single analysis pass).

    Postings are encoded lazily per term through the real codec
    (``encode_term_postings``) so block-max scorers see genuine
    TermPostings objects; a candidate-verify that touches 3 query terms
    encodes exactly 3 tiny posting lists.
    """

    def __init__(
        self,
        text: str,
        analyzer: "object | str" = "standard_en",
        norm_kind: str = "byte4",
        doc_id: int = 0,
        offsets: bool = False,
        payloads: bool = False,
        fields: Optional[Dict[str, object]] = None,
    ):
        from ..functions.analysis import make_analyzer

        an = make_analyzer(analyzer) if isinstance(analyzer, str) else analyzer
        self.analyzer_name = getattr(an, "name", "custom")
        offs = pays = None
        if offsets:
            terms, pos, starts, ends = an.analyze_offsets(text or "")
            offs = (starts, ends)
        elif payloads:
            terms, pos, pays = an.analyze_payloads(text or "")
        else:
            terms, pos = an.analyze_positions(text or "")
        self._init_from(terms, pos, offs, pays, norm_kind, doc_id, fields)

    @classmethod
    def from_tokens(
        cls,
        terms: Sequence[str],
        positions: Sequence[int],
        norm_kind: str = "byte4",
        doc_id: int = 0,
        analyzer_name: str = "custom",
        fields: Optional[Dict[str, object]] = None,
    ) -> "MemoryIndex":
        mi = cls.__new__(cls)
        mi.analyzer_name = analyzer_name
        mi._init_from(terms, positions, None, None, norm_kind, doc_id, fields)
        return mi

    def _init_from(self, terms, positions, offs, pays, norm_kind, doc_id,
                   fields) -> None:
        self.norm_kind = norm_kind
        self.doc_id = int(doc_id)
        self.doc_count = 1
        dl = len(terms)
        self.sum_total_tf = dl
        self.avgdl = float(dl) / 1.0 if dl else 0.0
        self.num_partitions = 1
        self.heavy_terms = frozenset()
        self.deleted = np.empty(0, dtype=np.int64)
        self.index_dir = None
        self._norm_key = int(int_to_byte4(np.asarray([dl]))[0]) if (
            norm_kind == "byte4"
        ) else dl
        # term -> ascending positions (+ parallel offsets/payloads)
        by_term: Dict[str, List[int]] = {}
        off_by_term: Dict[str, List[int]] = {} if offs is not None else None
        pay_by_term: Dict[str, List[float]] = {} if pays is not None else None
        for i, (t, p) in enumerate(zip(terms, positions)):
            by_term.setdefault(t, []).append(int(p))
            if off_by_term is not None:
                off_by_term.setdefault(t, []).extend(
                    (int(offs[0][i]), int(offs[1][i]))
                )
            if pay_by_term is not None:
                pay_by_term.setdefault(t, []).append(float(pays[i]))
        self._pos: Dict[str, np.ndarray] = {}
        self._off: Optional[Dict[str, np.ndarray]] = (
            {} if off_by_term is not None else None
        )
        self._pay: Optional[Dict[str, np.ndarray]] = (
            {} if pay_by_term is not None else None
        )
        for t, pl in by_term.items():
            order = np.argsort(np.asarray(pl, dtype=np.int64), kind="stable")
            self._pos[t] = np.asarray(pl, dtype=np.int32)[order]
            if off_by_term is not None:
                pairs = np.asarray(off_by_term[t], dtype=np.int32).reshape(-1, 2)
                self._off[t] = pairs[order].ravel()
            if pay_by_term is not None:
                self._pay[t] = np.asarray(pay_by_term[t], dtype=np.float32)[order]
        self._postings: Dict[str, List[TermPostings]] = {}
        self._sorted_terms: Optional[List[str]] = None
        self._fields: Dict[str, object] = dict(fields or {})
        self._doc_values: Dict[str, _MemDocValues] = {}

    # ---- stats / postings ------------------------------------------------
    def term_stats(self, term: str) -> Tuple[int, int]:
        pl = self._pos.get(term)
        return (1, len(pl)) if pl is not None else (0, 0)

    def postings(self, term: str) -> List[TermPostings]:
        hit = self._postings.get(term)
        if hit is not None:
            return hit
        pl = self._pos.get(term)
        if pl is None:
            out: List[TermPostings] = []
        else:
            buf = bytearray()
            off, length = encode_term_postings(
                buf,
                np.asarray([self.doc_id], dtype=np.int64),
                np.asarray([len(pl)], dtype=np.int64),
                np.asarray([self._norm_key], dtype=np.int64),
            )
            out = [parse_term_postings(memoryview(bytes(buf)), off, length)]
        self._postings[term] = out
        return out

    def all_terms(self) -> List[str]:
        return self._sorted_vocab()

    def all_doc_ids(self) -> np.ndarray:
        return np.asarray([self.doc_id], dtype=np.int64)

    # ---- positions / offsets / payloads ----------------------------------
    @property
    def has_positions(self) -> bool:
        return True

    def term_positions(self, term: str):
        pl = self._pos.get(term)
        if pl is None:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0, dtype=np.int32)
        return (
            np.asarray([self.doc_id], dtype=np.int64),
            np.asarray([len(pl)], dtype=np.int64),
            pl,
        )

    @property
    def has_offsets(self) -> bool:
        return self._off is not None

    def term_offsets(self, term: str):
        if self._off is None:
            raise ValueError("MemoryIndex built without offsets=True")
        fl = self._off.get(term)
        if fl is None:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0, dtype=np.int32)
        return (
            np.asarray([self.doc_id], dtype=np.int64),
            np.asarray([len(fl) // 2], dtype=np.int64),
            fl,
        )

    @property
    def has_payloads(self) -> bool:
        return self._pay is not None

    def term_payloads(self, term: str):
        if self._pay is None:
            raise ValueError("MemoryIndex built without payloads=True")
        fl = self._pay.get(term)
        if fl is None:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0, dtype=np.float32)
        return (
            np.asarray([self.doc_id], dtype=np.int64),
            np.asarray([len(fl)], dtype=np.int64),
            fl,
        )

    # ---- doc values / filters ---------------------------------------------
    def doc_values(self, field: str) -> _MemDocValues:
        dv = self._doc_values.get(field)
        if dv is None:
            dv = _MemDocValues(self.doc_id, self._fields.get(field))
            self._doc_values[field] = dv
        return dv

    str_doc_values = doc_values

    def doc_values_for(self, field: str, docs):
        return self.doc_values(field).values_for(docs)

    def field_exists_docs(self, field: str) -> np.ndarray:
        return self.doc_values(field).doc_sorted_ids

    def filter_docs(self, filters) -> Optional[np.ndarray]:
        out = None
        for field, lo, hi in filters:
            if lo == "in":
                docs = self.doc_values(field).in_set_docs(hi)
            elif lo == "multirange":
                dv = self.doc_values(field)
                parts = [dv.range_docs(int(a), int(b)) for a, b in hi]
                docs = (
                    np.unique(np.concatenate(parts))
                    if parts
                    else np.empty(0, dtype=np.int64)
                )
            else:
                docs = self.doc_values(field).range_docs(int(lo), int(hi))
            out = docs if out is None else np.intersect1d(
                out, docs, assume_unique=True
            )
        return out

    # ---- multi-term expansion ---------------------------------------------
    def _sorted_vocab(self) -> List[str]:
        if self._sorted_terms is None:
            self._sorted_terms = sorted(self._pos)
        return self._sorted_terms

    def expand_multi(self, kind: str, pattern: str, arg: int) -> List[str]:
        from ..functions.multiterm import (
            MAX_EXPANSIONS,
            expand,
            literal_prefix,
            literal_suffix,
        )

        vocab = self._sorted_vocab()
        use_rev = (
            kind == "wildcard"
            and not literal_prefix(pattern)
            and bool(literal_suffix(pattern))
        )
        rvocab = sorted(t[::-1] for t in vocab) if use_rev else None
        return sorted(expand(kind, pattern, arg, vocab, rvocab=rvocab))[
            :MAX_EXPANSIONS
        ]

    # ---- convenience ------------------------------------------------------
    def search(self, query) -> float:
        """Score of THE document for ``query`` (0.0 on no match) — the
        reference's ``MemoryIndex.search(Query)`` float return."""
        from ..functions.query import score_blockmax

        docs, scores = score_blockmax(self, query, 1)
        return float(scores[0]) if len(docs) else 0.0


class MemoryBatchIndex:
    """Ephemeral in-RAM index over ONE BATCH of documents — the monitor
    module's DocumentBatch (monitor/src/java/org/apache/lucene/monitor/
    DocumentBatch.java: collect the incoming docs into a MemoryIndex /
    ByteBuffersDirectory reader, then run every candidate query against
    that one reader instead of per-document).

    Built with the SAME vectorized inversion as the build pipeline's
    AnalyzerStage (dictionary-encode the flat token stream, one
    np.unique over term-major packed pair keys, one lexsort for the
    positions stream), and exposing the IndexReader protocol — so
    ``matching_docs`` / ``score_blockmax`` / the positional kernels run
    unmodified with ALL their vectorization across the batch's docs.
    Postings for a term are encoded through the real codec on first
    access (queries touch a handful of terms; the rest never encode).

    Doc IDs must be unique within the batch (they are reordered
    ascending internally, as the codec requires)."""

    def __init__(
        self,
        doc_ids: np.ndarray,
        term_lists: Sequence[Sequence[str]],
        pos_lists: Sequence[Sequence[int]],
        norm_kind: str = "byte4",
        analyzer_name: str = "custom",
    ):
        import itertools

        import pyarrow as pa

        self.norm_kind = norm_kind
        self.analyzer_name = analyzer_name
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        order = np.argsort(doc_ids, kind="stable")
        self._doc_ids = doc_ids[order]
        term_lists = [term_lists[i] for i in order]
        pos_lists = [pos_lists[i] for i in order]
        n_docs = len(term_lists)
        lens = np.fromiter(
            (len(x) for x in term_lists), dtype=np.int64, count=n_docs
        )
        total = int(lens.sum())
        self.doc_count = n_docs
        self.sum_total_tf = total
        self.avgdl = total / max(n_docs, 1)
        self.num_partitions = 1
        self.heavy_terms = frozenset()
        self.deleted = np.empty(0, dtype=np.int64)
        self.index_dir = None
        self._doc_norm_keys = (
            int_to_byte4(lens).astype(np.int64)
            if norm_kind == "byte4"
            else lens
        )
        if total == 0:
            self._vocab: List[str] = []
            self._code_of: Dict[str, int] = {}
            self._postings: Dict[str, List[TermPostings]] = {}
            return
        flat = pa.array(
            list(itertools.chain.from_iterable(term_lists)), pa.string()
        )
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy().astype(np.int64)
        dictionary = denc.dictionary.to_pylist()
        nv = len(dictionary)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        # term-major pair keys: ascending uniq order groups each term's
        # rows contiguously with docs ascending inside the group
        pair = codes * n_docs + doc_idx
        uniq, tfs = np.unique(pair, return_counts=True)
        self._u_code = uniq // n_docs
        self._u_docidx = uniq % n_docs
        self._u_tf = tfs.astype(np.int64)
        self._row_start = np.searchsorted(
            self._u_code, np.arange(nv), side="left"
        )
        self._row_end = np.searchsorted(
            self._u_code, np.arange(nv), side="right"
        )
        pos_flat = np.fromiter(
            itertools.chain.from_iterable(pos_lists),
            dtype=np.int32, count=total,
        )
        p_order = np.lexsort((pos_flat, pair))
        self._pos_sorted = pos_flat[p_order]
        self._pos_bounds = np.concatenate(
            ([0], np.cumsum(self._u_tf))
        ).astype(np.int64)
        self._vocab = dictionary
        self._code_of = {t: i for i, t in enumerate(dictionary)}
        self._postings = {}
        self._sorted_vocab_cache: Optional[List[str]] = None

    # ---- stats / postings ------------------------------------------------
    def _rows(self, term: str):
        c = self._code_of.get(term)
        if c is None:
            return None
        return int(self._row_start[c]), int(self._row_end[c])

    def term_stats(self, term: str) -> Tuple[int, int]:
        r = self._rows(term)
        if r is None:
            return (0, 0)
        lo, hi = r
        return hi - lo, int(self._u_tf[lo:hi].sum())

    def postings(self, term: str) -> List[TermPostings]:
        hit = self._postings.get(term)
        if hit is not None:
            return hit
        r = self._rows(term)
        if r is None:
            out: List[TermPostings] = []
        else:
            lo, hi = r
            di = self._u_docidx[lo:hi]
            buf = bytearray()
            off, length = encode_term_postings(
                buf,
                self._doc_ids[di],
                self._u_tf[lo:hi],
                self._doc_norm_keys[di],
            )
            out = [parse_term_postings(memoryview(bytes(buf)), off, length)]
        self._postings[term] = out
        return out

    def all_terms(self) -> List[str]:
        return self._sorted_vocab()

    def all_doc_ids(self) -> np.ndarray:
        return self._doc_ids

    # ---- positions ---------------------------------------------------------
    @property
    def has_positions(self) -> bool:
        return True

    has_offsets = False
    has_payloads = False

    def term_positions(self, term: str):
        r = self._rows(term)
        if r is None:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0, dtype=np.int32)
        lo, hi = r
        return (
            self._doc_ids[self._u_docidx[lo:hi]],
            self._u_tf[lo:hi],
            self._pos_sorted[self._pos_bounds[lo]:self._pos_bounds[hi]],
        )

    # ---- multi-term expansion ----------------------------------------------
    def _sorted_vocab(self) -> List[str]:
        if getattr(self, "_sorted_vocab_cache", None) is None:
            self._sorted_vocab_cache = sorted(self._vocab)
        return self._sorted_vocab_cache

    def expand_multi(self, kind: str, pattern: str, arg: int) -> List[str]:
        from ..functions.multiterm import (
            MAX_EXPANSIONS,
            expand,
            literal_prefix,
            literal_suffix,
        )

        vocab = self._sorted_vocab()
        use_rev = (
            kind == "wildcard"
            and not literal_prefix(pattern)
            and bool(literal_suffix(pattern))
        )
        rvocab = sorted(t[::-1] for t in vocab) if use_rev else None
        return sorted(expand(kind, pattern, arg, vocab, rvocab=rvocab))[
            :MAX_EXPANSIONS
        ]
