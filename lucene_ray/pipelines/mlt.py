"""MoreLikeThis: retrieve documents similar to a source document.

Reference: ``queries/src/java/org/apache/lucene/queries/mlt/MoreLikeThis.java``.
Semantics implemented (createQueue :630-675, createQuery :593-616):

* Analyze the source text; for each distinct term with source-doc
  ``tf >= minTermFreq`` (default 2, :165), corpus ``docFreq >= minDocFreq``
  (default 5, :173) and ``docFreq <= maxDocFreq`` (default unbounded, :182),
  score it ``tf * idf`` with ClassicSimilarity idf
  ``ln((docCount + 1) / (docFreq + 1)) + 1``
  (core/.../similarities/ClassicSimilarity.java:69-71).
* Keep the top ``maxQueryTerms`` (default 25, :232) and form a SHOULD-only
  BooleanQuery of them.
* With ``boost=True`` each TermQuery gets boost
  ``boostFactor * score / bestScore`` where — faithfully to the reference —
  ``bestScore`` is the FIRST term popped off the min-ordered PriorityQueue,
  i.e. the LOWEST selected score (:598-606), so boosts are >= boostFactor.

Documented deviations (mirrored exactly by the DuckDB oracle arm):

* The reference PQ breaks equal scores by insertion order; we pin the total
  order (score desc, term asc) so selection is deterministic on both arms.
* Scores are float64 (this repo's SQL-parity chain), not float32.

Scale shape: term selection is a point operation — one analyzer pass over
ONE document plus O(vocab-of-doc) dictionary lookups against the reader's
term stats (no corpus scan); the retrieval itself is the standard block-max
BM25 path. At cluster scale the per-query cost is identical to any other
boolean query; batches of source docs fan out like any query batch.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..functions.query import BooleanQuery, score_blockmax
from ..functions.rounding import round_half_away


def interesting_terms(
    reader,
    text: str,
    analyzer,
    min_tf: int = 2,
    min_df: int = 5,
    max_df: Optional[int] = None,
    max_terms: int = 25,
) -> List[Tuple[str, float]]:
    """The MLT term-selection core: [(term, tf*idf score)] sorted
    (score desc, term asc), capped at max_terms."""
    toks = analyzer.analyze(text)
    if not toks:
        return []
    terms, tfs = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    return interesting_terms_from_tfs(
        reader, dict(zip((str(t) for t in terms), (int(c) for c in tfs))),
        min_tf=min_tf, min_df=min_df, max_df=max_df, max_terms=max_terms,
    )


def interesting_terms_from_tfs(
    reader,
    tf_map: Dict[str, int],
    min_tf: int = 2,
    min_df: int = 5,
    max_df: Optional[int] = None,
    max_terms: int = 25,
) -> List[Tuple[str, float]]:
    """Term selection from a stored {term: tf} map — the reference's
    retrieveTerms(docNum) path that reads the doc's TERM VECTOR instead of
    re-analyzing stored text (MoreLikeThis.java:745-783); the scoring and
    selection arithmetic is shared with the text path above."""
    n_docs = int(reader.doc_count)
    scored: List[Tuple[float, str]] = []
    for t, tf in tf_map.items():
        tf = int(tf)
        if tf < min_tf:
            continue
        df, _ = reader.term_stats(str(t))
        if df == 0 or df < min_df:
            continue
        if max_df is not None and df > max_df:
            continue
        idf = np.log((n_docs + 1) / (df + 1.0)) + 1.0
        scored.append((float(tf * idf), str(t)))
    scored.sort(key=lambda p: (-p[0], p[1]))
    return [(t, s) for s, t in scored[:max_terms]]


def mlt_query(
    reader,
    text: str,
    analyzer,
    boost: bool = False,
    boost_factor: float = 1.0,
    min_tf: int = 2,
    min_df: int = 5,
    max_df: Optional[int] = None,
    max_terms: int = 25,
) -> BooleanQuery:
    """Build the SHOULD-only MoreLikeThis BooleanQuery for one source doc."""
    sel = interesting_terms(
        reader, text, analyzer,
        min_tf=min_tf, min_df=min_df, max_df=max_df, max_terms=max_terms,
    )
    terms = tuple(t for t, _ in sel)
    boosts: Tuple[Tuple[str, float], ...] = ()
    if boost and sel:
        best = sel[-1][1]  # lowest selected score (reference pop order)
        boosts = tuple(
            (t, float(boost_factor * s / best)) for t, s in sel
        )
    return BooleanQuery(should=terms, boosts=boosts)


def more_like_this(
    index_dir: str,
    sources: Dict[int, str],
    k: int = 10,
    analyzer_name: str = "en_nostem_simple",
    boost: bool = False,
    boost_factor: float = 1.0,
    min_tf: int = 2,
    min_df: int = 5,
    max_df: Optional[int] = None,
    max_terms: int = 25,
    round_digits: Optional[int] = 4,
) -> pa.Table:
    """query_id -> source text  =>  (query_id, rank, doc_id, score) top-k
    MLT results per source through the block-max BM25 engine. A source
    whose selection is empty contributes no rows (same as the reference's
    empty BooleanQuery matching nothing)."""
    from ..functions.analysis import make_analyzer
    from .search import get_reader

    reader = get_reader(index_dir)
    an = make_analyzer(analyzer_name)
    qids: List[int] = []
    ranks: List[int] = []
    docs: List[int] = []
    scores: List[float] = []
    for qid in sorted(sources):
        q = mlt_query(
            reader, sources[qid], an,
            boost=boost, boost_factor=boost_factor,
            min_tf=min_tf, min_df=min_df, max_df=max_df, max_terms=max_terms,
        )
        if not q.should:
            continue
        d, s = score_blockmax(reader, q, k)
        qids.extend([qid] * len(d))
        ranks.extend(range(1, len(d) + 1))
        docs.extend(int(x) for x in d)
        s = np.asarray(s, dtype=np.float64)
        if round_digits is not None:
            s = round_half_away(s, round_digits)
        scores.extend(s.tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )


def more_like_this_from_vectors(
    index_dir: str,
    source_docs: List[int],
    k: int = 10,
    boost: bool = False,
    boost_factor: float = 1.0,
    min_tf: int = 2,
    min_df: int = 5,
    max_df: Optional[int] = None,
    max_terms: int = 25,
    round_digits: Optional[int] = 4,
) -> pa.Table:
    """MLT keyed by doc id, term selection from the stored TERM VECTORS
    sidecar (state/termvectors.py) — no re-analysis of source text; the
    source doc itself is excluded from its results (the reference's
    standard usage filters the seed doc). -> (query_id=doc, rank, doc_id,
    score)."""
    from ..state.termvectors import TermVectors
    from .search import get_reader

    reader = get_reader(index_dir)
    tv = TermVectors(index_dir)
    qids: List[int] = []
    ranks: List[int] = []
    docs: List[int] = []
    scores: List[float] = []
    for src in sorted(int(d) for d in source_docs):
        sel = interesting_terms_from_tfs(
            reader, tv.get(src),
            min_tf=min_tf, min_df=min_df, max_df=max_df, max_terms=max_terms,
        )
        terms = tuple(t for t, _ in sel)
        if not terms:
            continue
        boosts: Tuple[Tuple[str, float], ...] = ()
        if boost and sel:
            best = sel[-1][1]
            boosts = tuple(
                (t, float(boost_factor * s / best)) for t, s in sel
            )
        q = BooleanQuery(should=terms, boosts=boosts)
        d, s = score_blockmax(reader, q, k + 1)
        keep = d != src
        d, s = d[keep][:k], np.asarray(s, dtype=np.float64)[keep][:k]
        qids.extend([src] * len(d))
        ranks.extend(range(1, len(d) + 1))
        docs.extend(int(x) for x in d)
        if round_digits is not None:
            s = round_half_away(s, round_digits)
        scores.extend(s.tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )
