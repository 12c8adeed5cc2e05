"""Query model + top-k BM25 execution kernels.

Query surface (phrase-free per the north rule): term queries and boolean
combinations MUST / SHOULD / MUST_NOT with ``minimum_should_match``
(reference: core/src/java/org/apache/lucene/search/BooleanQuery.java:40-105,
TermQuery.java:120-164). Semantics implemented:

* candidates: intersection of MUST terms (all required); if no MUST clauses,
  union of SHOULD terms matching at least ``max(1, msm)`` of them; with MUST
  clauses and msm>0, candidates must additionally match >= msm SHOULD terms.
* MUST_NOT excludes; scoring = sum of BM25 scores of matching MUST + SHOULD
  terms, accumulated in sorted-unique-term order (fixed order makes float32
  sums reproducible; the reference's own sum order is heap-dependent, so we
  pin ours and the oracle to the same canonical order).
* ties: (score desc, doc_id asc), global docIDs make this total
  (reference: TopScoreDocCollector.java:26-28, TopDocs.java:75-122).

Two executors, required to be result-identical (tested dumb-vs-smart, the
reference's TestWANDScorer pattern):

* :func:`score_exhaustive` — decode every posting block, vectorized.
* :func:`score_blockmax` — block-max pruned. Instead of a per-doc WAND loop
  (slow in Python), doc space is cut into elementary intervals on posting
  *block* boundaries; each interval's upper bound is the sum of the active
  blocks' impact-frontier max scores (reference: MaxScoreCache.java:137-158,
  ImpactsDISI.java:67-99, WANDScorer.java:31-153). Intervals are processed in
  descending upper bound ("impact ordering") so the top-k threshold rises
  fast; an interval is skipped when its bound is below the current kth score.
  Bounds are padded by the worst-case float32 accumulation error, mirroring
  the reference's round-up of max scores vs round-down of the competitive
  threshold (WANDScorer.java:90-120) — pruning stays conservative, so top-k
  is exact.
"""

from __future__ import annotations

import heapq
import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .bm25 import make_scorer


class LruDict(dict):
    """Size-bounded LRU mapping for warm-reader caches (``_scored_full`` /
    ``_champions`` / ``_expansions``): a long-lived searcher actor serving a
    high-cardinality or multi-(k1,b) query stream must not accumulate full
    decoded+scored posting copies without bound (reference analogue:
    search/LRUQueryCache.java — the reference also caps its per-reader query
    cache). dict insertion order + pop/reinsert gives move-to-end; eviction
    drops the least-recently-used entry. Changing ``bm25_params`` retires
    old-keyed entries naturally via this eviction."""

    def __init__(self, max_entries: int = 256):
        super().__init__()
        self.max_entries = max_entries

    def get(self, key, default=None):
        try:
            val = super().pop(key)
        except KeyError:
            return default
        super().__setitem__(key, val)  # reinsert == most-recently-used
        return val

    def __setitem__(self, key, value):
        if super().__contains__(key):
            super().pop(key)
        elif len(self) >= self.max_entries:
            super().pop(next(iter(self)))
        super().__setitem__(key, value)


# ---------------------------------------------------------------------------
# Query model + mini parser
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TermQuery:
    term: str


@dataclass(frozen=True)
class PhraseQuery:
    """Phrase over a positions-enabled index (reference:
    search/PhraseQuery.java + ExactPhraseMatcher.java /
    SloppyPhraseMatcher.java). ``offsets`` are the analyzed terms' position
    increments relative to the first kept term — a dropped stopword leaves
    a gap (``"data the stream"`` -> terms (data, stream), offsets (0, 2)),
    exactly the reference's QueryParser-built phrase with position gaps.

    ``slop > 0`` (``"a b"~N`` syntax) allows per-term displacement: a match
    anchored at a position of the first term takes the EXACT minimal
    displacement window over one position choice per remaining term
    (smallest-range sweep in ``_min_window``); matchLength L = window
    width must be <= slop, and each match contributes the reference's
    sloppyWeight 1/(1+L) to the (float) phrase frequency (BM25Similarity
    feeds float freqs). The classic behavior follows: adjacent extra word
    needs slop 1, reversed order needs slop 2. Repeated terms claim
    distinct raw token positions (SloppyPhraseMatcher repeats handling),
    exact up to ``_REPEAT_COMBO_CAP`` assignments per anchor. Anchor
    enumeration is per-first-term-position — a deterministic, SQL-
    expressible refinement of the reference's PhrasePositions sweep
    (documented deviation: the reference may count extra wider matches
    per anchor); slop=0 is the exact adjacency matcher."""

    terms: Tuple[str, ...]
    offsets: Tuple[int, ...]
    slop: int = 0


@dataclass(frozen=True)
class MixedQuery:
    """Boolean query with PHRASE clauses alongside term clauses — the
    reference's BooleanQuery nesting PhraseQuery sub-queries (e.g.
    ``+"data stream" key``). ``base`` holds the flat term/filter part;
    each phrase carries its occur role. Semantics follow BooleanQuery:
    a MUST phrase makes plain SHOULD terms optional; with no required
    clause anywhere, matching needs >= 1 SHOULD clause (term or phrase);
    scores sum over every matching scoring clause (base first, then
    phrases in query order — the canonical float accumulation order the
    SQL oracle mirrors). minimum_should_match is not supported together
    with phrase clauses."""

    base: BooleanQuery
    phrases: Tuple[Tuple[PhraseQuery, str], ...] = ()


@dataclass(frozen=True)
class NestedQuery:
    """Arbitrary-depth BooleanQuery tree — the classic parser's full
    recursion (queryparser/.../classic/QueryParserBase.java:133 Clause ->
    '(' Query ')', any depth, phrases allowed anywhere). ``base`` holds
    this level's FLAT term/filter content (same executor and float
    accumulation as a standalone flat query); ``children`` are the
    sub-clauses in canonical order — phrase clauses in text order first,
    then parenthesized groups in text order — each ``(occur, query)``
    with occur in must/should/must_not and query a NestedQuery,
    BooleanQuery, MixedQuery or PhraseQuery.

    BooleanQuery semantics apply per node: every MUST child and a
    required base must match; with no required clause, >= 1 SHOULD
    clause (base or child) must; MUST_NOT children exclude. A matching
    doc's score sums base first, then matching MUST children in
    ``children`` order, then matching SHOULD children in ``children``
    order (each child's internal order is its own canonical order) —
    the float accumulation contract the SQL oracle mirrors (same
    combiner as MixedQuery).
    minimum_should_match composes only with a child-free level."""

    base: BooleanQuery
    children: Tuple[Tuple[str, object], ...] = ()


@dataclass(frozen=True)
class SynonymQuery:
    """Query-time synonym blending (reference: core/.../search/
    SynonymQuery.java:50,211-229): the terms score as ONE pseudo-term —
    blended docFreq = max of the terms' docFreqs, totalTermFreq = sum,
    and per-doc freq = sum of the terms' freqs in that doc — so a rare
    synonym cannot dominate via its own high idf (the demoted-idf path).
    Unboosted variant (every synonym at boost 1)."""

    terms: Tuple[str, ...]


@dataclass(frozen=True)
class MultiPhrase:
    """MultiPhraseQuery (reference: core/.../search/MultiPhraseQuery.java):
    a phrase where each position accepts ANY of an array of terms (the
    classic parser builds these from multi-term-per-position analysis,
    e.g. synonyms inside quotes). Matching unions each slot's postings
    (UnionPostingsEnum, :414) and intersects across slots at the phrase
    offsets; scoring uses ONE similarity application with idf summed over
    every present (slot, term) pair in declaration order (:218-239 —
    duplicated terms count once per slot, faithfully kept) and
    freq = number of phrase occurrences. Exact (slop=0) matcher."""

    term_arrays: Tuple[Tuple[str, ...], ...]
    offsets: Tuple[int, ...]


@dataclass(frozen=True)
class MatchAllQuery:
    """Every live document, constant score 1.0 (reference:
    search/MatchAllDocsQuery.java); parsed from the classic `*:*`."""


@dataclass(frozen=True)
class DisMaxQuery:
    """Disjunction-max: candidates = union of terms; score per doc =
    max(term scores) + tie_breaker * (sum of the other matching scores)
    (reference: search/DisjunctionMaxQuery.java:24-56 — "the maximum score
    for that document as produced by any subquery, plus a tie breaking
    increment for any additional matching subqueries")."""

    terms: Tuple[str, ...]
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class BlendedTermQuery:
    """BlendedTermQuery (reference: core/.../search/BlendedTermQuery.java,
    the cross-field "blended statistics" query): each term scores
    INDIVIDUALLY but with BLENDED collection stats — df = max of the
    terms' docFreqs, ttf = SUM of their totalTermFreqs (rewrite(),
    :281-292 + adjustFrequencies) — so a rare variant cannot dominate
    through its own idf yet still contributes its own tf/norm chain
    (unlike SynonymQuery's single summed-freq pseudo-term). Per-term
    ``boosts`` multiply the similarity weight (Builder.add(term, boost)
    -> BoostQuery, w = boost * idf). ``rewrite`` selects the
    RewriteMethod: "dismax" = DISJUNCTION_MAX_REWRITE (the reference
    default, tieBreaker 0.01, :190) or "boolean" = BOOLEAN_REWRITE
    (plain SHOULD sum, :138)."""

    terms: Tuple[str, ...]
    boosts: Tuple[float, ...] = ()
    rewrite: str = "dismax"
    tie_breaker: float = 0.01


@dataclass(frozen=True)
class BooleanQuery:
    must: Tuple[str, ...] = ()
    should: Tuple[str, ...] = ()
    must_not: Tuple[str, ...] = ()
    minimum_should_match: int = 0
    # multi-term clauses: (kind, pattern, arg, role) with kind in
    # {prefix, wildcard, fuzzy}, role in {should, must_not}; expanded
    # against the term dictionary at execution time (functions/multiterm.py,
    # reference: search/MultiTermQuery.java SCORING_BOOLEAN_REWRITE). Each
    # matched term scores with its own idf and counts individually toward
    # minimum_should_match.
    multi: Tuple[Tuple[str, str, int, str], ...] = ()
    # query-time boosts: (term, boost) pairs from `term^2.5` syntax;
    # boost multiplies the term's BM25 weight (reference: BoostQuery /
    # BM25Similarity boost param, search/BoostQuery.java,
    # BM25Similarity.java:221 w = boost * idf)
    boosts: Tuple[Tuple[str, float], ...] = ()
    # numeric range FILTER clauses: (field, lo, hi) over an int64
    # doc-values column, candidates-intersecting and non-scoring
    # (reference: PointRangeQuery as a BooleanClause.Occur.FILTER,
    # search/PointRangeQuery.java, document/IntPoint.java; parsed from
    # the classic `field:[lo TO hi]` syntax)
    filters: Tuple[Tuple[str, int, int], ...] = ()
    # required-OR term groups — the nested boolean a MUST multi-term clause
    # (`+pre*`) rewrites to: each group is a disjunction that the doc MUST
    # match at least once; its terms score individually like SHOULD terms
    # (reference: MultiTermQuery SCORING_BOOLEAN_REWRITE wrapped in a MUST
    # occur, search/ScoringRewrite.java + BooleanQuery nesting)
    must_groups: Tuple[Tuple[str, ...], ...] = ()


def graph_boolean_query(segments, operator: str = "or"):
    """Compile query-time graph-analysis segments
    (analysis.SynonymGraphAnalyzer.analyze_graph) into a query — the
    reference's QueryBuilder.analyzeGraphBoolean
    (core/.../util/QueryBuilder.java:560-640): each articulation span
    with a side path becomes a disjunction with one TermQuery /
    PhraseQuery clause per path, and the spans combine under the
    operator (MUST for AND, SHOULD for OR).

    Shapes produced: all-plain segments -> flat BooleanQuery; a single
    all-single-token multi-path segment -> SynonymQuery (the reference's
    no-side-path stacked-token case); otherwise a NestedQuery whose base
    carries the plain tokens (in segment order) and whose children are
    the multi-path segments, each an inner NestedQuery of SHOULD term
    alternatives plus SHOULD exact-phrase alternatives. Documented
    deviation: an all-single-token multi-path segment EMBEDDED in a
    larger query compiles to the SHOULD-of-TermQuery disjunction, not a
    blended SynonymQuery (NestedQuery children carry term/phrase/boolean
    clauses only); scores differ from the reference's blending there."""
    occur = "must" if operator == "and" else "should"
    if all(len(s) == 1 and len(s[0]) == 1 for s in segments):
        return BooleanQuery(
            **{occur: tuple(s[0][0] for s in segments)}
        )
    if len(segments) == 1 and all(len(a) == 1 for a in segments[0]):
        return SynonymQuery(terms=tuple(a[0] for a in segments[0]))
    base_terms = []
    children = []
    for seg in segments:
        if len(seg) == 1 and len(seg[0]) == 1:
            base_terms.append(seg[0][0])
            continue
        if len(seg) == 1:
            # one path, multi token: a plain phrase clause
            children.append(
                (occur, PhraseQuery(
                    terms=seg[0], offsets=tuple(range(len(seg[0])))
                ))
            )
            continue
        terms = tuple(a[0] for a in seg if len(a) == 1)
        phrases = tuple(
            PhraseQuery(terms=a, offsets=tuple(range(len(a))))
            for a in seg
            if len(a) > 1
        )
        children.append(
            (occur, NestedQuery(
                base=BooleanQuery(should=terms),
                children=tuple(("should", p) for p in phrases),
            ))
        )
    return NestedQuery(
        base=BooleanQuery(**{occur: tuple(base_terms)}),
        children=tuple(children),
    )


def parse_query(text: str, analyzer):
    """Query parser: flat queries take the flat fast path below
    (:func:`_parse_flat`, byte-compatible with previous rounds); queries
    with nested parentheses (depth >= 2) or a phrase inside a group —
    which the flat grammar cannot represent (and used to silently
    misparse / reject) — build a recursive :class:`NestedQuery` tree,
    matching the classic parser's full recursion
    (queryparser/.../classic/QueryParserBase.java:133)."""
    if _needs_nesting(text):
        return _parse_nested(text, analyzer)
    return _parse_flat(text, analyzer)


def _needs_nesting(text: str) -> bool:
    """True when the query has parens depth >= 2, a quoted phrase inside a
    group, or SIGNED members / connectives inside a group — everything the
    flat one-level grammar would silently strip (the flat group body is
    analyzed as bare terms, so ``+(a -b)`` used to lose the ``-``).
    ``field:(...)`` set filters at the top level are flat syntax and don't
    count. Malformed input returns False so the flat parser raises its
    usual errors."""
    import re as _re

    depth = 0
    maxd = 0
    structured_group = False
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == '"':
            j = text.find('"', i + 1)
            if j < 0:
                return False
            if depth > 0:
                structured_group = True
            i = j + 1
            continue
        if c == "(":
            if depth == 0 and _re.search(r"\w:$", text[:i]):
                j = text.find(")", i + 1)
                if j < 0:
                    return False
                i = j + 1
                continue
            depth += 1
            maxd = max(maxd, depth)
            i += 1
            continue
        if c == ")":
            depth = max(0, depth - 1)
            i += 1
            continue
        if depth > 0:
            prev = text[i - 1] if i > 0 else " "
            nxt = text[i + 1] if i + 1 < n else " "
            if prev in " (" and (
                (c == "+" and (nxt.isalnum() or nxt in '("'))
                or (c == "-" and (nxt.isalpha() or nxt in '("'))
            ):
                structured_group = True
            elif c in "AON" and prev == " ":
                m = _re.match(r"(?:AND|OR|NOT)(?=\s|$)", text[i:])
                if m is not None:
                    structured_group = True
        i += 1
    return maxd >= 2 or structured_group


def _split_groups(text: str):
    """Split one nesting level: -> (flat remainder, [(sign, inner)]) for
    the top-level parenthesized groups in text order. Quotes are opaque;
    ``field:(...)`` set filters stay in the remainder."""
    import re as _re

    rem: List[str] = []
    groups: List[Tuple[str, str]] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == '"':
            j = text.find('"', i + 1)
            if j < 0:
                raise ValueError("unbalanced quote in query")
            rem.append(text[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            prev = "".join(rem)
            if _re.search(r"\w:$", prev):
                # set filter: copy atomically into the flat remainder
                j = text.find(")", i + 1)
                if j < 0:
                    raise ValueError("unbalanced parenthesis in query")
                rem.append(text[i : j + 1])
                i = j + 1
                continue
            sign = ""
            m = _re.search(r"(?:^|[\s(])([+-])$", prev)
            if m is not None:
                sign = m.group(1)
                rem = [prev[:-1]]
            depth, j = 1, i + 1
            while j < n and depth:
                cj = text[j]
                if cj == '"':
                    jq = text.find('"', j + 1)
                    if jq < 0:
                        raise ValueError("unbalanced quote in query")
                    j = jq + 1
                    continue
                if cj == "(":
                    depth += 1
                elif cj == ")":
                    depth -= 1
                j += 1
            if depth:
                raise ValueError("unbalanced parenthesis in query")
            groups.append((sign, text[i + 1 : j - 1]))
            rem.append(" ")
            i = j
            continue
        if c == ")":
            raise ValueError("unbalanced parenthesis in query")
        rem.append(c)
        i += 1
    return "".join(rem), groups


def _is_empty_flat(q) -> bool:
    return isinstance(q, BooleanQuery) and not (
        q.must or q.should or q.must_not or q.multi or q.filters
        or q.must_groups
    )


def _parse_nested(text: str, analyzer) -> "NestedQuery":
    """One level of the recursive grammar: extract top-level groups, parse
    the remainder with the flat parser (phrases become children), recurse
    into each group through parse_query (which re-dispatches). Canonical
    child order: this level's phrase clauses in text order, then groups
    in text order."""
    remainder, groups = _split_groups(text)
    children: List[Tuple[str, object]] = []
    flat = _parse_flat(remainder, analyzer)
    if isinstance(flat, MatchAllQuery):
        raise ValueError("*:* cannot combine with sub-clauses")
    if isinstance(flat, PhraseQuery):
        base: BooleanQuery = BooleanQuery()
        children.append(("should", flat))
    elif isinstance(flat, MixedQuery):
        base = flat.base
        children.extend((role, ph) for ph, role in flat.phrases)
    else:
        base = flat
    if base.minimum_should_match:
        raise ValueError(
            "minimum_should_match with nested sub-clauses is not supported"
        )
    for sign, inner in groups:
        sub = parse_query(inner, analyzer)
        if _is_empty_flat(sub):
            # a group that analyzes to nothing (stopwords) drops its
            # clause, like the reference parser
            continue
        role = {"+": "must", "-": "must_not", "": "should"}[sign]
        children.append((role, sub))
    if not children:
        return base
    return NestedQuery(base=base, children=tuple(children))


def query_terms(q) -> set:
    """Every term in the query tree (the global-stats gather for sharded
    search: df must be summed for each of these before scoring)."""
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, PhraseQuery):
        return set(q.terms)
    if isinstance(q, (DisMaxQuery, SynonymQuery, BlendedTermQuery)):
        return set(q.terms)
    if isinstance(q, MultiPhrase):
        return {t for arr in q.term_arrays for t in arr}
    if isinstance(q, MatchAllQuery):
        return set()
    if isinstance(q, MixedQuery):
        s = query_terms(q.base)
        for ph, _role in q.phrases:
            s |= set(ph.terms)
        return s
    if isinstance(q, NestedQuery):
        s = query_terms(q.base)
        for _role, child in q.children:
            s |= query_terms(child)
        return s
    s = set(q.must) | set(q.should) | set(q.must_not)
    for g in q.must_groups:
        s |= set(g)
    return s


def _parse_flat(text: str, analyzer) -> BooleanQuery:
    """Tiny query parser for the reference query set: bare terms (SHOULD),
    ``+term`` (MUST), ``-term`` (MUST_NOT), the connectives AND / OR /
    NOT between bare terms, and a trailing ``~N`` setting
    ``minimum_should_match`` (reference analogue: the classic QueryParser's
    term/boolean subset, queryparser/.../classic/QueryParserBase.java:133,
    and BooleanQuery.setMinimumNumberShouldMatch,
    core/.../search/BooleanQuery.java:40-105).
    Terms are analyzed by the same chain as indexing; a query token that
    analyzes to nothing (stopword) is dropped.

    Multi-term syntax (expanded at execution time, see multiterm.py):
    ``pre*`` prefix, ``t?rm`` / ``t*rm`` wildcard, ``term~`` / ``term~1`` /
    ``term~2`` fuzzy. Patterns are lowercased but NOT analyzed (the classic
    parser's lowercase_expanded_terms). Supported as bare (SHOULD), ``-``
    (MUST_NOT) or ``+`` (MUST) clauses; a ``+`` clause becomes a required-OR
    group (``must_groups``) — the nested boolean the reference's
    SCORING_BOOLEAN_REWRITE produces under a MUST occur."""
    import re as _re

    must: List[str] = []
    should: List[str] = []
    must_not: List[str] = []
    multi: List[Tuple[str, str, int, str]] = []
    boosts: List[Tuple[str, float]] = []
    filters: List[Tuple[str, int, int]] = []

    def _grab_range(m) -> str:
        filters.append((m.group(1), int(m.group(2)), int(m.group(3))))
        return " "

    stripped = text.strip()
    if stripped == "*:*":
        return MatchAllQuery()
    # quoted phrase: `"exact phrase"` or `"sloppy phrase"~N` as the WHOLE
    # query -> PhraseQuery (mixing phrase and term clauses needs nested
    # boolean structure the flat model doesn't have)
    pm = _re.fullmatch(r'"([^"]*)"(?:~(\d+))?', stripped)
    if pm is not None:
        terms, pos = analyzer.analyze_positions(pm.group(1))
        offsets = tuple(p - pos[0] for p in pos) if pos else ()
        return PhraseQuery(
            terms=tuple(terms), offsets=offsets,
            slop=int(pm.group(2) or 0),
        )
    # quoted phrase CLAUSES mixed with terms: `+"data stream" key`,
    # `-"exact phrase" term`, `"a b"~2 other` — the classic parser's
    # BooleanQuery-nesting-PhraseQuery (queryparser/.../classic/
    # QueryParserBase.java getFieldQuery with quoted input). A phrase
    # that analyzes to nothing (all stopwords) drops its clause, like
    # the reference parser.
    phrase_clauses: List[Tuple[PhraseQuery, str]] = []
    if _re.search(r'\([^()]*"', text):
        # a phrase inside a parenthesized group would be extracted as a
        # top-level clause and silently change the grouping
        raise ValueError("phrases inside parenthesized groups are not supported")

    def _grab_phrase(m) -> str:
        sign, body, slop = m.group(1), m.group(2), m.group(3)
        role = {"+": "must", "-": "must_not", "": "should"}[sign]
        p_terms, p_pos = analyzer.analyze_positions(body)
        if p_terms:
            offsets = tuple(p - p_pos[0] for p in p_pos)
            phrase_clauses.append(
                (
                    PhraseQuery(
                        terms=tuple(p_terms), offsets=offsets,
                        slop=int(slop or 0),
                    ),
                    role,
                )
            )
        return " "

    text = _re.sub(r'([+-]?)"([^"]*)"(?:~(\d+))?', _grab_phrase, text)
    if '"' in text:
        raise ValueError("unbalanced quote in query")
    # `field:[lo TO hi]` inclusive numeric range filter (classic parser's
    # range syntax; values are the field's int64 doc-values encoding, e.g.
    # epoch microseconds for timestamps)
    text = _re.sub(r"(\w+):\[(-?\d+)\s+TO\s+(-?\d+)\]", _grab_range, text)

    # `field:(v1 v2 ...)` set-membership FILTER over a string doc-values
    # field (reference: search/TermInSetQuery.java used as a filter over
    # a SortedDocValues keyword field — the constant-score many-term
    # disjunction a web pipeline uses for lang/source allowlists). Values
    # are lowercased, never analyzed.
    def _grab_set(m) -> str:
        values = tuple(sorted({v.lower() for v in m.group(2).split()}))
        if not values:
            raise ValueError(f"empty set filter for field {m.group(1)!r}")
        filters.append((m.group(1), "in", values))
        return " "

    text = _re.sub(r"(\w+):\(([^()]*)\)", _grab_set, text)

    # `+(t1 t2)` / `-(t1 t2)` / `(t1 t2)` parenthesized term groups — one
    # level of the classic parser's nested BooleanQuery
    # (queryparser/.../classic/QueryParserBase.java getBooleanQuery via
    # Clause -> '(' Query ')'):  `+(...)` is a required disjunction
    # (must_groups), `-(...)` negates every member (NOT(a OR b) =
    # NOT a AND NOT b), bare `(...)` is the flat SHOULD it already means.
    # Terms are analyzed; a group that analyzes empty (all stopwords) is
    # dropped like the reference parser drops stopword-only clauses.
    group_must: List[Tuple[str, ...]] = []
    group_not: List[str] = []

    def _grab_group(m) -> str:
        sign, body = m.group(1), m.group(2)
        if any(c in body for c in "*?~/[]\""):
            # analyzing would silently strip the operator and change the
            # query's meaning (same policy as the fuzzy-distance guard);
            # a required multi-term clause is spelled `+pre*` instead
            raise ValueError(
                f"multi-term syntax inside a group is not supported: "
                f"({body})"
            )
        terms = tuple(analyzer.analyze(body))
        if not terms:
            return " "
        if sign == "+":
            group_must.append(terms)
            return " "
        if sign == "-":
            group_not.extend(terms)
            return " "
        return " " + " ".join(terms) + " "

    text = _re.sub(r"(?<![\w:])([+-]?)\(([^()]*)\)", _grab_group, text)

    # bare `[lo TO hi]` / `{lo TO hi}` on the default text field: term
    # range over the dictionary (reference: search/TermRangeQuery.java via
    # the classic parser's getRangeQuery, queryparser/.../classic/
    # QueryParserBase.java). Brackets pick inclusivity per end; `*` is an
    # open bound. Bounds are lowercased but never analyzed, like the other
    # expanded clauses.
    def _grab_trange(m) -> str:
        from .multiterm import TRANGE_INCL_HI, TRANGE_INCL_LO

        sign, lb, lo_s, hi_s, rb = m.groups()
        role = {"+": "must", "-": "must_not", "": "should"}[sign]
        arg = (TRANGE_INCL_LO if lb == "[" else 0) | (
            TRANGE_INCL_HI if rb == "]" else 0
        )
        lo_s = "" if lo_s == "*" else lo_s.lower()
        hi_s = "" if hi_s == "*" else hi_s.lower()
        multi.append(("trange", lo_s + "\x00" + hi_s, arg, role))
        return " "

    text = _re.sub(
        r"(?<![\w:])([+-]?)([\[{])([\w*]+)\s+TO\s+([\w*]+)([\]}])",
        _grab_trange,
        text,
    )
    mode_all = False
    msm = 0
    tokens = text.split()
    neg_next = False
    for raw in tokens:
        if raw.startswith("~") and raw[1:].isdigit():
            msm = int(raw[1:])
            continue
        up = raw.upper()
        if up == "AND":
            mode_all = True
            continue
        if up == "OR":
            continue
        if up == "NOT":
            neg_next = True
            continue
        role = "should"
        if raw.startswith("+"):
            role, raw = "must", raw[1:]
        elif raw.startswith("-") and len(raw) > 1 and not raw[1].isdigit():
            role, raw = "must_not", raw[1:]
        if neg_next:
            role = "must_not"
            neg_next = False
        boost = None
        bm = _re.fullmatch(r"(.+)\^(\d+(?:\.\d+)?)", raw)
        if bm is not None:
            raw, boost = bm.group(1), float(bm.group(2))
        fz = _re.fullmatch(r"(.+?)~([012])?", raw)
        kind = None
        if len(raw) >= 3 and raw.startswith("/") and raw.endswith("/"):
            # classic parser's /regexp/ syntax (RegexpQuery); pattern
            # lowercased like other expanded clauses, never analyzed
            kind = ("regexp", raw[1:-1].lower(), 0)
        elif "*" in raw or "?" in raw:
            body = raw.lower()
            kind = (
                ("prefix", body[:-1], 0)
                if body.endswith("*") and "*" not in body[:-1] and "?" not in body
                else ("wildcard", body, 0)
            )
        elif fz is not None:
            kind = ("fuzzy", fz.group(1).lower(), int(fz.group(2) or 2))
        elif "~" in raw:
            # 'term~5' / classic float similarity 'roam~0.8': the reference
            # parser clamps/rejects such distances — silently analyzing the
            # raw string would turn it into unrelated SHOULD terms
            raise ValueError(
                f"unsupported fuzzy distance in {raw!r}: only ~, ~0, ~1, ~2 "
                "are supported"
            )
        if kind is not None:
            if boost is not None:
                raise ValueError(
                    "boost on a prefix/wildcard/fuzzy clause is not supported"
                )
            multi.append((*kind, role))
            continue
        dest = {"must": must, "should": should, "must_not": must_not}[role]
        for term in analyzer.analyze(raw):
            dest.append(term)
            if boost is not None:
                boosts.append((term, boost))
    if mode_all:
        if any(role == "should" for *_k, role in multi):
            raise ValueError(
                "AND over a prefix/wildcard/fuzzy clause needs nested "
                "boolean structure; use the bare (OR) form"
            )
        must.extend(should)
        should = []
    base = BooleanQuery(
        must=tuple(must), should=tuple(should),
        must_not=tuple(must_not) + tuple(group_not),
        minimum_should_match=msm, multi=tuple(multi), boosts=tuple(boosts),
        filters=tuple(filters), must_groups=tuple(group_must),
    )
    if phrase_clauses:
        if msm:
            raise ValueError(
                "minimum_should_match with phrase clauses is not supported"
            )
        return MixedQuery(base=base, phrases=tuple(phrase_clauses))
    return base


# ---------------------------------------------------------------------------
# Per-term cursor over a term's (possibly bucket-split) posting blobs
# ---------------------------------------------------------------------------


class TermCursor:
    """Flattens a term's bucket blobs into one global block sequence with
    per-block (first_doc, last_doc, max_score) arrays — our MaxScoreCache."""

    def __init__(self, term: str, postings_list, scorer, full_cache=None,
                 deleted=None):
        self.term = term
        self.scorer = scorer
        self._parts = postings_list
        # liveDocs tombstones (sorted doc-id array): filtered out of every
        # decoded slice; block_max/impact bounds stay valid upper bounds
        self.deleted = deleted if deleted is not None and len(deleted) else None
        # reader-level cross-query cache of the full scored list (keyed by
        # (term, scorer params)); None -> per-part caches only
        self._full_cache = full_cache
        # global block b -> (part, local block) as two arrays
        nbs = [tp.n_blocks for tp in postings_list]
        self._part_id = np.repeat(
            np.arange(len(postings_list), dtype=np.int32), nbs
        )
        self._local_b = (
            np.concatenate([np.arange(nb, dtype=np.int32) for nb in nbs])
            if nbs
            else np.empty(0, dtype=np.int32)
        )
        firsts, lasts, ms = [], [], []
        rk = scorer.ratio_key() if scorer is not None else None
        for pi, tp in enumerate(postings_list):
            if scorer is not None:
                if tp.frontier_m is None:
                    tp.frontier_m = {}
                fm = tp.frontier_m.get(rk)
                if fm is None:
                    # cache on the postings object per ratio_key: one
                    # vectorized ratio pass over ALL frontier pairs + a
                    # reduceat per-block max (frontiers are never empty)
                    sizes = np.fromiter(
                        (len(x) for x in tp.frontier_tfs),
                        dtype=np.int64,
                        count=tp.n_blocks,
                    )
                    if tp.n_blocks and sizes.min() > 0:
                        flat = scorer.ratio_array(
                            np.concatenate(tp.frontier_tfs),
                            np.concatenate(tp.frontier_keys),
                        ).astype(np.float64)
                        starts = np.concatenate(
                            ([0], np.cumsum(sizes)[:-1])
                        )
                        fm = np.maximum.reduceat(flat, starts)
                    else:
                        fm = np.asarray(
                            [
                                scorer.frontier_m(
                                    tp.frontier_tfs[lb], tp.frontier_keys[lb]
                                )
                                for lb in range(tp.n_blocks)
                            ],
                            dtype=np.float64,
                        )
                    tp.frontier_m[rk] = fm
                ms.append(fm)
            firsts.append(tp.first_docs)
            lasts.append(tp.last_docs)
        self.first_docs = (
            np.concatenate(firsts) if firsts else np.empty(0, dtype=np.int64)
        )
        self.last_docs = (
            np.concatenate(lasts) if lasts else np.empty(0, dtype=np.int64)
        )
        if scorer is not None and ms:
            self.block_max = scorer.scores_from_m(np.concatenate(ms)).astype(
                np.float64
            )
        else:
            self.block_max = np.zeros(len(self._part_id), dtype=np.float64)
        self.df = sum(tp.df for tp in postings_list)
        self._cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._full_min: Optional[float] = None

    @property
    def n_blocks(self) -> int:
        return len(self._part_id)

    def _live(self, docs: np.ndarray, scores: np.ndarray):
        """Drop tombstoned docs from a decoded+scored slice (liveDocs)."""
        dead = self.deleted
        if dead is None or len(docs) == 0:
            return docs, scores
        lo = int(np.searchsorted(dead, docs[0]))
        hi = int(np.searchsorted(dead, docs[-1], side="right"))
        dn = dead[lo:hi]
        if len(dn) == 0:
            return docs, scores
        pos = np.minimum(np.searchsorted(dn, docs), len(dn) - 1)
        keep = dn[pos] != docs
        if keep.all():
            return docs, scores
        return docs[keep], scores[keep]

    def scored_block(self, b: int) -> Tuple[np.ndarray, np.ndarray]:
        """-> (doc_ids, scores) of block b, decoded+scored once, cached."""
        hit = self._cache.get(b)
        if hit is not None:
            return hit
        pi, lb = int(self._part_id[b]), int(self._local_b[b])
        docs, tfs, keys = self._parts[pi].decode_block(lb)
        scores = self.scorer.score_array(tfs, keys)
        docs, scores = self._live(docs, scores)
        self._cache[b] = (docs, scores)
        return docs, scores

    def decode_all(self) -> Tuple[np.ndarray, np.ndarray]:
        """Whole-list (docs, scores): bulk BM25 scores are fixed per
        (term, index stats), so a warm reader's cross-query cache
        (``full_cache``) serves repeats with zero decode or arithmetic —
        the analogue of a Lucene searcher keeping hot postings resident.
        Also records the list's min score (``_full_min``) for the exact
        union shortcut in the dense combiner."""
        if self.n_blocks == 0:
            self._full_min = 0.0
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        key = (self.term, self.scorer.cache_key())
        if self._full_cache is not None:
            hit = self._full_cache.get(key)
            if hit is not None:
                docs, scores, self._full_min = hit
                return docs, scores
        docs_parts, score_parts = [], []
        for tp in self._parts:
            d, tfs, keys = tp.decode_all()
            docs_parts.append(d)
            score_parts.append(self.scorer.score_array(tfs, keys))
        if len(docs_parts) == 1:
            docs, scores = docs_parts[0], score_parts[0]
        else:
            docs = np.concatenate(docs_parts)
            scores = np.concatenate(score_parts)
        docs, scores = self._live(docs, scores)
        self._full_min = float(scores.min()) if len(scores) else 0.0
        if self._full_cache is not None:
            self._full_cache[key] = (docs, scores, self._full_min)
        return docs, scores

    def docs_in(self, lo: int, hi: int) -> Tuple[np.ndarray, np.ndarray]:
        """(docs, scores) with lo <= doc <= hi, using block skip data."""
        if self.n_blocks == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        b0 = int(np.searchsorted(self.last_docs, lo))
        b1 = int(np.searchsorted(self.first_docs, hi, side="right"))
        out_d, out_s = [], []
        for b in range(b0, b1):
            docs, scores = self.scored_block(b)
            i = int(np.searchsorted(docs, lo))
            j = int(np.searchsorted(docs, hi, side="right"))
            if i < j:
                out_d.append(docs[i:j])
                out_s.append(scores[i:j])
        if not out_d:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        return np.concatenate(out_d), np.concatenate(out_s)


# ---------------------------------------------------------------------------
# Shared combination kernel (used by both executors on full or interval data)
# ---------------------------------------------------------------------------


def _combine(
    cursors_docs_scores: Sequence[Tuple[np.ndarray, np.ndarray]],
    is_must: np.ndarray,
    n_must: int,
    msm: int,
    not_docs: Optional[np.ndarray],
    dtype,
) -> Tuple[np.ndarray, np.ndarray]:
    """Combine per-term (docs, scores) into (candidate docs, summed scores).

    ``cursors_docs_scores`` is ordered by the canonical sorted-term order;
    scores are accumulated in that order so float sums are reproducible.
    """
    # fast path: one scoring term, no exclusions — the posting list IS the
    # (sorted, unique) candidate set
    if (
        len(cursors_docs_scores) == 1
        and (not_docs is None or len(not_docs) == 0)
        and ((n_must == 0 and msm <= 1) or (n_must == 1 and msm == 0))
    ):
        docs, scores = cursors_docs_scores[0]
        return docs, scores.astype(dtype, copy=False)
    if n_must:
        cand = None
        for (docs, _), m in zip(cursors_docs_scores, is_must):
            if not m:
                continue
            cand = docs if cand is None else np.intersect1d(cand, docs)
            if len(cand) == 0:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype)
        if msm > 0:
            should_docs = [
                d for (d, _), m in zip(cursors_docs_scores, is_must) if not m
            ]
            if should_docs:
                alld = np.concatenate(should_docs)
                u, c = np.unique(alld, return_counts=True)
                ok = u[c >= msm]
                cand = cand[np.isin(cand, ok, assume_unique=True)]
            else:
                cand = cand[:0]
    else:
        should_docs = [d for (d, _) in cursors_docs_scores]
        if not should_docs:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype)
        alld = np.concatenate(should_docs)
        if len(alld) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype)
        u, c = np.unique(alld, return_counts=True)
        cand = u[c >= max(1, msm)]
    if not_docs is not None and len(not_docs) and len(cand):
        pos = np.searchsorted(not_docs, cand)
        pos[pos >= len(not_docs)] = len(not_docs) - 1
        cand = cand[not_docs[pos] != cand]
    if len(cand) == 0:
        return cand, np.empty(0, dtype=dtype)
    acc = np.zeros(len(cand), dtype=dtype)
    for docs, scores in cursors_docs_scores:
        if len(docs) == 0:
            continue
        pos = np.searchsorted(docs, cand)
        pos_c = np.minimum(pos, len(docs) - 1)
        hit = docs[pos_c] == cand
        if hit.any():
            acc[hit] += scores[pos_c[hit]].astype(dtype)
    return cand, acc


def _topk_from(cand: np.ndarray, scores: np.ndarray, k: int):
    if len(cand) == 0 or k <= 0:
        return cand[:0], scores[:0]
    if len(cand) > k:
        # kth-largest score, then keep every candidate at or above it so
        # boundary ties survive for the (score desc, doc_id asc) sort.
        # Value partition in the native dtype (float32->float64 is exact,
        # so the kth threshold and the >= mask are unchanged) — avoids a
        # whole-list float64 copy + index argpartition.
        kth = np.partition(scores, len(scores) - k)[len(scores) - k]
        mask = scores >= kth
        cand, scores = cand[mask], scores[mask]
    order = np.lexsort((cand, -scores.astype(np.float64)))[:k]
    return cand[order], scores[order]


# ---------------------------------------------------------------------------
# Executors
# ---------------------------------------------------------------------------


def _term_scorer(reader, df: int, ttf: int, boost: float = 1.0):
    """Per-term scorer honoring the searcher's similarity selection:
    ``reader.similarity`` None/("bm25",) -> BM25 with reader.bm25_params;
    otherwise functions/similarities.py builds the model (LMDirichlet,
    Classic TF-IDF) from the same collection + term stats."""
    sim = getattr(reader, "similarity", None)
    if sim is None or sim[0] == "bm25":
        k1, b = getattr(reader, "bm25_params", (1.2, 0.75))
        return make_scorer(
            reader.norm_kind, reader.doc_count, reader.sum_total_tf, df,
            k1=k1, b=b, boost=boost,
        )
    from .similarities import make_similarity

    return make_similarity(
        sim, reader.norm_kind, reader.doc_count, reader.sum_total_tf, df,
        ttf, boost=boost,
    )


def _prepare(reader, query: BooleanQuery):
    """-> (scoring cursors in canonical order, is_must flags, not_cursors,
    dtype, must-group cursor lists) or None when a MUST term — or every
    expansion of a MUST multi-term group — is missing from the index."""
    if isinstance(query, TermQuery):
        query = BooleanQuery(should=(query.term,))
    if getattr(query, "multi", ()):
        from .multiterm import resolve_multi

        query = resolve_multi(
            query,
            reader.expand_multi,
            reader.__dict__.setdefault("_expansions", LruDict(256)),
        )
    must = sorted(set(query.must))
    should = sorted(set(query.should) - set(must))
    roles = [(t, True) for t in must] + [(t, False) for t in should]
    roles.sort()  # canonical order over all scoring terms
    cursors = []
    is_must = []
    # cross-query scored-list cache lives on the reader (warm actor state);
    # LRU-bounded so a long-lived searcher can't accumulate scored copies
    full_cache = reader.__dict__.setdefault("_scored_full", LruDict(512))
    boost_map = dict(getattr(query, "boosts", ()))
    # query-time similarity parameters (reference: IndexSearcher
    # .setSimilarity — per-searcher, not per-index); BM25(k1, b) via
    # reader.bm25_params, non-BM25 models via reader.similarity (a spec
    # tuple handled by functions/similarities.py)
    deleted = getattr(reader, "deleted", None)
    for term, m in roles:
        df, ttf = reader.term_stats(term)
        if df == 0:
            if m:
                return None
            continue
        scorer = _term_scorer(reader, df, ttf, boost_map.get(term, 1.0))
        cursors.append(
            TermCursor(term, reader.postings(term), scorer, full_cache,
                       deleted=deleted)
        )
        is_must.append(m)
    not_cursors = [
        TermCursor(t, reader.postings(t), None)
        for t in sorted(set(query.must_not))
        if reader.term_stats(t)[0] > 0
    ]
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    # required-OR groups (MUST multi-term clauses): cursors per group term;
    # a group with zero indexed expansions makes the query unsatisfiable
    group_cursors: List[List[TermCursor]] = []
    for g in getattr(query, "must_groups", ()):
        gc = []
        for t in sorted(set(g)):
            df, ttf = reader.term_stats(t)
            if df == 0:
                continue
            scorer = _term_scorer(reader, df, ttf, boost_map.get(t, 1.0))
            gc.append(
                TermCursor(t, reader.postings(t), scorer, full_cache,
                           deleted=deleted)
            )
        if not gc:
            return None
        group_cursors.append(gc)
    return (cursors, np.asarray(is_must, dtype=bool), not_cursors, dtype,
            group_cursors)


class _NotCursorView:
    """Decode-everything view of MUST_NOT terms (cheap: exclusion only)."""

    @staticmethod
    def all_docs(not_cursors) -> Optional[np.ndarray]:
        if not not_cursors:
            return None
        parts = []
        for nc in not_cursors:
            docs, _, _ = (
                nc._parts[0].decode_all()
                if len(nc._parts) == 1
                else _concat_parts(nc._parts)
            )
            parts.append(docs)
        return np.unique(np.concatenate(parts)) if parts else None


def _concat_parts(parts):
    ds, ts, ks = zip(*(p.decode_all() for p in parts))
    return np.concatenate(ds), np.concatenate(ts), np.concatenate(ks)


#: dense bulk-scoring accumulator cap — above this doc-space size the sparse
#: combine is used instead (a 10^12-doc index is always queried per
#: doc-range shard, so per-searcher doc spaces stay far below this)
DENSE_DOC_LIMIT = 50_000_000


def _dense_combine(
    per_term, is_must, n_must, msm, not_docs, dtype, doc_count,
    pos_scores: bool = False,
):
    """BooleanScorer-style dense bucket scoring: one scatter-add per term
    over a doc-space accumulator (docs are dense global ints). Identical
    accumulation order to the sparse path: cursors arrive in canonical
    sorted-term order and each term's docs are unique.

    ``pos_scores``: caller certifies every term's min score is > 0. For a
    pure union (no MUST, msm<=1) the candidate set is then exactly
    ``acc > 0`` — IEEE addition of positives never rounds below the larger
    addend, so a matching doc's sum stays positive — and the per-term
    match-count scatter is skipped entirely."""
    union_only = n_must == 0 and msm <= 1
    skip_counts = union_only and pos_scores
    cnt_t = np.uint8 if len(per_term) < 256 else np.uint16
    acc = np.zeros(doc_count, dtype=dtype)
    cnt_must = np.zeros(doc_count, dtype=cnt_t) if n_must else None
    cnt_should = (
        None if skip_counts else np.zeros(doc_count, dtype=cnt_t)
    )
    for (docs, scores), m in zip(per_term, is_must):
        if len(docs) == 0:
            if m:
                return np.empty(0, np.int64), np.empty(0, dtype)
            continue
        acc[docs] += scores.astype(dtype, copy=False)
        if m:
            cnt_must[docs] += 1
        elif not skip_counts:
            cnt_should[docs] += 1
    if n_must:
        mask = cnt_must == n_must
        if msm > 0:
            mask &= cnt_should >= msm
    elif skip_counts:
        mask = acc > 0
    else:
        mask = cnt_should >= max(1, msm)
    if not_docs is not None and len(not_docs):
        mask[not_docs[not_docs < doc_count]] = False
    cand = np.flatnonzero(mask)
    return cand, acc[cand]


def _group_candidates(
    reader, query, cursors, is_must, not_cursors, dtype, groups, filters
):
    """Nested-boolean path for required-OR groups (MUST multi-term clauses):
    candidates = (MUST intersection) ∩ (each group's union) [∩ msm-SHOULD
    when msm>0]; plain SHOULD terms become optional scorers once a required
    group exists (the reference's BooleanQuery semantics with a MUST
    sub-query present). Scores accumulate over ALL scoring clauses in
    canonical sorted-term order."""
    per_term = [c.decode_all() for c in cursors]
    msm = query.minimum_should_match if isinstance(query, BooleanQuery) else 0
    n_must = int(is_must.sum())
    cand = None
    if n_must:
        for (docs, _), m in zip(per_term, is_must):
            if not m:
                continue
            cand = docs if cand is None else np.intersect1d(
                cand, docs, assume_unique=True
            )
            if len(cand) == 0:
                return cand, np.empty(0, dtype=dtype), dtype
    if msm > 0:
        should_docs = [
            d for (d, _), m in zip(per_term, is_must) if not m
        ]
        if should_docs:
            u, c = np.unique(np.concatenate(should_docs), return_counts=True)
            ok = u[c >= msm]
        else:
            ok = np.empty(0, dtype=np.int64)
        cand = ok if cand is None else cand[
            np.isin(cand, ok, assume_unique=True)
        ]
    for g in groups:
        gdocs = np.unique(np.concatenate([c.decode_all()[0] for c in g]))
        if len(gdocs) == 0:
            return gdocs, np.empty(0, dtype=dtype), dtype
        cand = gdocs if cand is None else np.intersect1d(
            cand, gdocs, assume_unique=True
        )
        if len(cand) == 0:
            return cand, np.empty(0, dtype=dtype), dtype
    not_docs = _NotCursorView.all_docs(not_cursors)
    if not_docs is not None and len(not_docs) and len(cand):
        pos = np.minimum(np.searchsorted(not_docs, cand), len(not_docs) - 1)
        cand = cand[not_docs[pos] != cand]
    if filters and len(cand):
        fdocs = reader.filter_docs(filters)
        if fdocs is None or len(fdocs) == 0:
            cand = cand[:0]
        else:
            pos = np.minimum(np.searchsorted(fdocs, cand), len(fdocs) - 1)
            cand = cand[fdocs[pos] == cand]
    cand = np.asarray(cand, dtype=np.int64)
    acc = np.zeros(len(cand), dtype=dtype)
    if len(cand):
        allc = sorted(
            list(cursors) + [c for g in groups for c in g],
            key=lambda c: c.term,
        )
        for c in allc:
            docs, scores = c.decode_all()
            if len(docs) == 0:
                continue
            pos = np.minimum(np.searchsorted(docs, cand), len(docs) - 1)
            hit = docs[pos] == cand
            if hit.any():
                acc[hit] += scores[pos[hit]].astype(dtype)
    return cand, acc, dtype


#: phrase key packing: key = doc * 2^POS_SHIFT + (pos - offset + pad);
#: positions must stay below 2^POS_SHIFT - pad (4M-token docs; the
#: reference's IndexWriter.MAX_POSITION is 2^31-1 — ours is narrower and
#: guarded)
_POS_SHIFT = 22


def _packed_pos_keys(reader, term: str):
    """(keys, max_pos): doc-tagged position keys ``doc << POS_SHIFT + pos``
    ascending, cached per warm reader (LRU-bounded) and SHARED between
    the phrase and span matchers — per-query offset shifts are a constant
    add on the cached base, so repeats skip the np.repeat rebuild."""
    cache = reader.__dict__.setdefault("_packed_pos", LruDict(256))
    hit = cache.get(term)
    if hit is None:
        docs, tfs, flat = reader.term_positions(term)
        keys = (np.repeat(docs, tfs) << np.int64(_POS_SHIFT)) + flat.astype(
            np.int64
        )
        hit = (keys, int(flat.max()) if len(flat) else -1)
        cache[term] = hit
    return hit


def _term_positions_cached(reader, term: str):
    """(docs, tfs, flat, pstarts): the raw positions triple plus per-doc
    prefix starts, cached per warm reader (LRU-bounded, same lifecycle
    as ``_packed_pos``): the sloppy matchers consume the RAW arrays (not
    the packed keys), and decoding positions dominated their per-query
    cost on warm searchers before this cache."""
    cache = reader.__dict__.setdefault("_raw_pos", LruDict(256))
    hit = cache.get(term)
    if hit is None:
        docs, tfs, flat = reader.term_positions(term)
        pstarts = np.concatenate(([0], np.cumsum(tfs))).astype(np.int64)
        hit = (docs, tfs, flat, pstarts)
        cache[term] = hit
    return hit


def _phrase_scored(reader, phrase: PhraseQuery):
    """-> (docs, scores, dtype) for an exact phrase, or None when any term
    is absent / the index lacks positions. Vectorized ExactPhraseMatcher:
    clause i contributes the sorted key set doc*2^s + (pos - offset_i);
    the iterated sorted intersection leaves one key per phrase occurrence,
    and a bincount per doc yields phraseFreq. BM25 scores with
    idf = sum of the terms' idfs (BM25Similarity.idfExplain over the
    phrase's term statistics) and tf = phraseFreq, norm from the first
    term's posting payload (reference: PhraseWeight + BM25Similarity)."""
    import math

    if not getattr(reader, "has_positions", False):
        raise ValueError(
            "phrase queries need a positions-enabled index "
            "(IndexConfig.positions=True)"
        )
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype), dtype)
    if not phrase.terms:
        return None
    k1, b = getattr(reader, "bm25_params", (1.2, 0.75))
    pad = max(phrase.offsets) + 1
    sloppy = getattr(phrase, "slop", 0) > 0
    pos_cache: Dict[str, tuple] = {}
    idf64 = 0.0
    for t in phrase.terms:
        df, _ = reader.term_stats(t)
        if df == 0:
            return empty
        idf64 += math.log(
            1.0 + (reader.doc_count - df + 0.5) / (df + 0.5)
        )
        if sloppy and t not in pos_cache:
            pos_cache[t] = _term_positions_cached(reader, t)[:3]
    if sloppy:
        docs_u, pf = _sloppy_freqs(pos_cache, phrase)
        if len(docs_u) == 0:
            return empty
    else:
        key_sets = []
        for t, off in zip(phrase.terms, phrase.offsets):
            base, max_pos = _packed_pos_keys(reader, t)
            if max_pos + pad >= (1 << _POS_SHIFT):
                raise ValueError("document too long for phrase key packing")
            # per-query shift = constant add on the cached base keys
            key = base + np.int64(pad - off)
            key_sets.append(key)  # ascending (doc asc, pos asc)
        key_sets.sort(key=len)
        inter = key_sets[0]
        for ks in key_sets[1:]:
            if len(inter) == 0:
                return empty
            pos = np.minimum(np.searchsorted(ks, inter), len(ks) - 1)
            inter = inter[ks[pos] == inter]
        if len(inter) == 0:
            return empty
        occ_docs = inter >> np.int64(_POS_SHIFT)
        docs_u, pf = np.unique(occ_docs, return_counts=True)
    deleted = getattr(reader, "deleted", None)
    if deleted is not None and len(deleted) and len(docs_u):
        pos = np.minimum(np.searchsorted(deleted, docs_u), len(deleted) - 1)
        keep = deleted[pos] != docs_u
        docs_u, pf = docs_u[keep], pf[keep]
    if len(docs_u) == 0:
        return empty
    # norm payload: every phrase doc carries the first term; gather its key
    keys = _gather_norm_keys(reader, phrase.terms[0], docs_u)
    scorer = make_scorer(
        reader.norm_kind, reader.doc_count, reader.sum_total_tf, 1,
        k1=k1, b=b,
    )
    if reader.norm_kind == "byte4":
        scorer.idf = np.float32(idf64)
        scorer.weight = np.float32(idf64)
    else:
        scorer.idf = idf64
        scorer.weight = idf64
    # sloppy freqs are floats (sum of 1/(1+L) weights) — the reference's
    # Similarity.score(freq, norm) takes float freq too
    scores = scorer.score_array(np.asarray(pf), keys)
    return docs_u.astype(np.int64), scores.astype(dtype, copy=False), dtype


def _min_window(fixed, lists):
    """Smallest covering-range width over the singleton values ``fixed``
    plus one element from each sorted array in ``lists`` (the classic
    smallest-range-over-K-lists sweep: repeatedly record the current
    span and advance the minimum list). Because the fixed values are
    singleton lists, every recorded span contains them, so the result is
    the minimal window through those anchors. Returns None if a list is
    empty."""
    heap = []
    for fi, v in enumerate(fixed):
        heap.append((int(v), -1 - fi))
    ptr = [0] * len(lists)
    for i, arr in enumerate(lists):
        if len(arr) == 0:
            return None
        heap.append((int(arr[0]), i))
    end = max(v for v, _ in heap)
    heapq.heapify(heap)
    best = None
    while True:
        v, i = heapq.heappop(heap)
        w = end - v
        if best is None or w < best:
            best = w
        if i < 0:
            return best  # a fixed anchor is the minimum: cannot advance
        ptr[i] += 1
        if ptr[i] >= len(lists[i]):
            return best
        nv = int(lists[i][ptr[i]])
        if nv > end:
            end = nv
        heapq.heappush(heap, (nv, i))


# repeats handling: cap on the product of the repeated slots' candidate
# windows per anchor; beyond it each repeated window is truncated to the
# positions nearest the anchor (bounded work on pathological docs)
_REPEAT_COMBO_CAP = 4096
_REPEAT_TRUNC = 16


def _sloppy_freqs(pos_cache: Dict[str, tuple], phrase: PhraseQuery):
    """Sloppy phrase frequencies (SloppyPhraseMatcher analogue): for each
    candidate doc (boolean AND of the phrase terms) and each anchor
    position of the first term, L = the EXACT minimal displacement-window
    width over one position choice per remaining term (smallest-range
    sweep, so 3+-term phrases are no longer greedy); matches with
    L <= slop contribute the reference's sloppyWeight 1/(1+L)
    (search/similarities/Similarity.java float freq). A repeated term
    must claim DISTINCT raw token positions (SloppyPhraseMatcher repeats
    handling) — enumerated exactly up to _REPEAT_COMBO_CAP choices per
    anchor. -> (docs, float freqs)."""
    per_term = [pos_cache[t] for t in phrase.terms]
    cand = per_term[0][0]
    for docs, _, _ in per_term[1:]:
        cand = np.intersect1d(cand, docs, assume_unique=True)
        if len(cand) == 0:
            return cand, np.empty(0, np.float64)
    # per term: row index of each candidate doc + position-slice bounds
    slices = []
    for (docs, tfs, flat), off in zip(per_term, phrase.offsets):
        starts = np.concatenate(([0], np.cumsum(tfs)))
        rows = np.searchsorted(docs, cand)
        slices.append((starts, rows, flat.astype(np.int64) - off))
    slop = phrase.slop
    offsets = phrase.offsets
    terms = phrase.terms
    nslots = len(terms)
    # slots of terms that appear more than once in the phrase need the
    # distinct-raw-position constraint; all others are free lists
    counts: Dict[str, int] = {}
    for t in terms:
        counts[t] = counts.get(t, 0) + 1
    rep_slots = [i for i in range(1, nslots) if counts[terms[i]] > 1]
    free_slots = [i for i in range(1, nslots) if counts[terms[i]] == 1]
    anchor_repeated = counts[terms[0]] > 1
    freqs = np.zeros(len(cand), dtype=np.float64)
    for ci in range(len(cand)):
        plists = []
        for starts, rows, disp in slices:
            r = int(rows[ci])
            plists.append(disp[int(starts[r]) : int(starts[r + 1])])
        f = 0.0
        for p0 in plists[0].tolist():
            # only positions within [p0-slop, p0+slop] can sit in a
            # window of width <= slop through the anchor
            wins = [None] * nslots
            ok = True
            for i in range(1, nslots):
                arr = plists[i]
                lo = int(np.searchsorted(arr, p0 - slop, "left"))
                hi = int(np.searchsorted(arr, p0 + slop, "right"))
                if hi <= lo:
                    ok = False
                    break
                wins[i] = arr[lo:hi]
            if not ok:
                continue
            if not rep_slots:
                L = _min_window([p0], [wins[i] for i in free_slots])
            else:
                L = _min_window_repeats(
                    p0, wins, rep_slots, free_slots, offsets, terms,
                    anchor_repeated,
                )
            if L is not None and L <= slop:
                f += 1.0 / (1.0 + L)
        freqs[ci] = f
    keep = freqs > 0
    return cand[keep], freqs[keep]


def _min_window_repeats(
    p0, wins, rep_slots, free_slots, offsets, terms, anchor_repeated
):
    """Exact minimal window when the phrase repeats a term: enumerate
    ordered assignments of the repeated slots (distinct raw positions per
    term, the anchor slot's raw position excluded for its own term), run
    the smallest-range sweep over anchor+assignment+free lists, take the
    min."""
    arrs = []
    total = 1
    for i in rep_slots:
        arr = wins[i]
        total *= len(arr)
        arrs.append(arr)
    if total > _REPEAT_COMBO_CAP:
        arrs = []
        for i in rep_slots:
            arr = wins[i]
            if len(arr) > _REPEAT_TRUNC:
                order = np.argsort(np.abs(arr - p0), kind="stable")
                arr = np.sort(arr[order[:_REPEAT_TRUNC]])
            arrs.append(arr)
    free = [wins[i] for i in free_slots]
    raw0 = p0 + offsets[0] if anchor_repeated else None
    best = None
    for combo in itertools.product(*[a.tolist() for a in arrs]):
        used = {}
        if raw0 is not None:
            used[terms[0]] = {raw0}
        ok = True
        for i, v in zip(rep_slots, combo):
            taken = used.setdefault(terms[i], set())
            rv = v + offsets[i]
            if rv in taken:
                ok = False
                break
            taken.add(rv)
        if not ok:
            continue
        L = _min_window([p0, *combo], free)
        if L is not None and (best is None or L < best):
            best = L
    return best


def _norm_key_arrays(reader, term: str):
    """(docs, keys) concatenated across the term's postings, cached per
    warm reader (LRU-bounded, same lifecycle as ``_packed_pos``): the
    pruned positional executors gather norm keys PER INTERVAL, and
    re-decoding the full postings each time dominated their profile."""
    cache = reader.__dict__.setdefault("_norm_keys", LruDict(256))
    hit = cache.get(term)
    if hit is None:
        parts = []
        for tp in reader.postings(term):
            d, _, k = tp.decode_all()
            parts.append((d, k))
        alld = np.concatenate([d for d, _ in parts])
        allk = np.concatenate([k for _, k in parts])
        hit = (alld, allk)
        cache[term] = hit
    return hit


def _gather_norm_keys(reader, term: str, docs_u: np.ndarray) -> np.ndarray:
    """Norm keys of ``docs_u`` from one term's postings (docs_u ⊆ its doc
    set by construction)."""
    alld, allk = _norm_key_arrays(reader, term)
    pos = np.minimum(np.searchsorted(alld, docs_u), len(alld) - 1)
    return allk[pos]


def _multi_phrase_scored(reader, q: "MultiPhrase"):
    """-> (docs, scores, dtype) or None. Vectorized UnionPostingsEnum:
    each slot's key set is the UNION of its terms' shifted position keys,
    then the same iterated sorted intersection as the exact phrase; one
    BM25 application with the declaration-order idf sum."""
    import math

    if not getattr(reader, "has_positions", False):
        raise ValueError(
            "multi-phrase queries need a positions-enabled index "
            "(IndexConfig.positions=True)"
        )
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype), dtype)
    if not q.term_arrays:
        return None
    k1, b = getattr(reader, "bm25_params", (1.2, 0.75))
    pad = max(q.offsets) + 1
    pos_cache: Dict[str, tuple] = {}
    idf64 = 0.0
    present_per_slot: List[List[str]] = []
    for slot_terms in q.term_arrays:
        present: List[str] = []
        for t in slot_terms:
            df, _ = reader.term_stats(t)
            if df == 0:
                continue  # absent terms contribute no stats (:227)
            idf64 += math.log(
                1.0 + (reader.doc_count - df + 0.5) / (df + 0.5)
            )
            present.append(t)
            if t not in pos_cache:
                pos_cache[t] = reader.term_positions(t)
        if not present:
            return empty  # a slot with zero indexed terms cannot match
        present_per_slot.append(present)
    key_sets: List[np.ndarray] = []
    for present, off in zip(present_per_slot, q.offsets):
        parts = []
        for t in present:
            base, max_pos = _packed_pos_keys(reader, t)
            if max_pos + pad >= (1 << _POS_SHIFT):
                raise ValueError("document too long for phrase key packing")
            parts.append(base + np.int64(pad - off))
        keys = np.concatenate(parts)
        keys.sort()  # union across the slot's terms (one term per token)
        key_sets.append(keys)
    key_sets.sort(key=len)
    inter = key_sets[0]
    for ks in key_sets[1:]:
        if len(inter) == 0:
            return empty
        pos = np.minimum(np.searchsorted(ks, inter), len(ks) - 1)
        inter = inter[ks[pos] == inter]
    if len(inter) == 0:
        return empty
    occ_docs = inter >> np.int64(_POS_SHIFT)
    docs_u, pf = np.unique(occ_docs, return_counts=True)
    deleted = getattr(reader, "deleted", None)
    if deleted is not None and len(deleted) and len(docs_u):
        pos = np.minimum(np.searchsorted(deleted, docs_u), len(deleted) - 1)
        keep = deleted[pos] != docs_u
        docs_u, pf = docs_u[keep], pf[keep]
    if len(docs_u) == 0:
        return empty
    # norm key per doc from whichever slot-0 term the doc carries
    keys_u = np.zeros(len(docs_u), dtype=np.int64)
    have = np.zeros(len(docs_u), dtype=bool)
    for t in present_per_slot[0]:
        docs_t = pos_cache[t][0]
        if len(docs_t) == 0:
            continue
        pos = np.minimum(np.searchsorted(docs_t, docs_u), len(docs_t) - 1)
        hit = (docs_t[pos] == docs_u) & ~have
        if hit.any():
            keys_u[hit] = _gather_norm_keys(reader, t, docs_u[hit])
            have[hit] = True
    scorer = make_scorer(
        reader.norm_kind, reader.doc_count, reader.sum_total_tf, 1,
        k1=k1, b=b,
    )
    if reader.norm_kind == "byte4":
        scorer.idf = np.float32(idf64)
        scorer.weight = np.float32(idf64)
    else:
        scorer.idf = idf64
        scorer.weight = idf64
    scores = scorer.score_array(np.asarray(pf), keys_u)
    return docs_u.astype(np.int64), scores.astype(dtype, copy=False), dtype


def _synonym_scored(reader, query: "SynonymQuery"):
    """-> (docs, scores, dtype) or None. Implements the reference blend
    (SynonymQuery.java:211-229): one scorer built from (max df, sum ttf),
    fed the per-doc SUM of the synonym terms' freqs; the norm key is the
    doc's own (terms share the document length)."""
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    df_blend, ttf_blend = 0, 0
    present: List[str] = []
    for t in sorted(set(query.terms)):
        df, ttf = reader.term_stats(t)
        if df > 0:
            df_blend = max(df_blend, df)
            ttf_blend += ttf
            present.append(t)
    if df_blend == 0:
        return None
    docs_parts, tf_parts, key_parts = [], [], []
    for t in present:
        for tp in reader.postings(t):
            d, tfs, keys = tp.decode_all()
            docs_parts.append(np.asarray(d, dtype=np.int64))
            tf_parts.append(np.asarray(tfs))
            key_parts.append(np.asarray(keys))
    docs = np.concatenate(docs_parts)
    tfs = np.concatenate(tf_parts)
    keys = np.concatenate(key_parts)
    order = np.argsort(docs, kind="stable")
    docs, tfs, keys = docs[order], tfs[order], keys[order]
    uniq, starts = np.unique(docs, return_index=True)
    sum_tf = np.add.reduceat(tfs.astype(np.int64), starts)
    key_u = keys[starts]
    deleted = getattr(reader, "deleted", None)
    if deleted is not None and len(deleted) and len(uniq):
        pos = np.minimum(np.searchsorted(deleted, uniq), len(deleted) - 1)
        keep = deleted[pos] != uniq
        uniq, sum_tf, key_u = uniq[keep], sum_tf[keep], key_u[keep]
    if len(uniq) == 0:
        return (np.empty(0, np.int64), np.empty(0, dtype=dtype), dtype)
    scorer = _term_scorer(reader, df_blend, ttf_blend)
    scores = scorer.score_array(sum_tf, key_u)
    return uniq, scores.astype(dtype, copy=False), dtype


def _mixed_candidates(reader, mq: "MixedQuery"):
    """Exhaustive executor for phrase+term boolean mixes -> (cand, acc,
    dtype). Required clauses = MUST phrases, plus the base when it has
    MUST/filter/group content — or when it has SHOULD terms and no MUST
    phrase exists (flat-boolean semantics degrade gracefully). Scores
    accumulate base-then-phrases in query order."""
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    scored = []
    for ph, role in mq.phrases:
        got = _phrase_scored(reader, ph)
        if got is None:
            scored.append((role, np.empty(0, np.int64),
                           np.empty(0, dtype=dtype)))
        else:
            scored.append((role, got[0], got[1]))
    return _clauses_candidates(reader, mq.base, scored)


def _nested_candidates(reader, nq: "NestedQuery"):
    """Exhaustive executor for arbitrary-depth boolean trees: each child
    clause evaluates RECURSIVELY through _exhaustive_candidates (nested
    groups, phrases, flat booleans all come back as (docs, scores)), then
    this level combines them under BooleanQuery semantics exactly like
    the phrase-mix path — one shared combiner, one accumulation contract
    (base first, then children in order)."""
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    scored = []
    for role, child in nq.children:
        got = _exhaustive_candidates(reader, child)
        if got is None or len(got[0]) == 0:
            scored.append((role, np.empty(0, np.int64),
                           np.empty(0, dtype=dtype)))
        else:
            scored.append(
                (role, np.asarray(got[0], dtype=np.int64),
                 np.asarray(got[1]))
            )
    return _clauses_candidates(reader, nq.base, scored)


def _clauses_candidates(reader, raw, scored):
    """Shared BooleanQuery-level combiner: ``raw`` is the level's flat
    base, ``scored`` the evaluated sub-clauses [(role, docs, scores)] in
    canonical order. -> (cand, acc, dtype) or the empty triple."""
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, np.int64), np.empty(0, dtype=dtype), dtype)
    must_p, should_p, not_p = [], [], []
    for role, docs, scores in scored:
        if role == "must":
            if len(docs) == 0:
                return empty
            must_p.append((docs, scores))
        elif role == "should":
            should_p.append((docs, scores))
        else:
            not_p.append(docs)
    # the base's MUST_NOT clauses exclude at the MIXED level (a
    # must_not-only base has no positive clause for the flat executor to
    # anchor on); positive content stays in base
    not_terms = tuple(sorted(set(raw.must_not)))
    not_multi = tuple(
        (k, p, a, "should") for (k, p, a, ro) in raw.multi
        if ro == "must_not"
    )
    base = BooleanQuery(
        must=raw.must, should=raw.should, must_not=(),
        minimum_should_match=0,
        multi=tuple(m for m in raw.multi if m[3] != "must_not"),
        boosts=raw.boosts, filters=raw.filters,
        must_groups=raw.must_groups,
    )
    if not_terms or not_multi:
        ex = _exhaustive_candidates(
            reader, BooleanQuery(should=not_terms, multi=not_multi)
        )
        if ex is not None and len(ex[0]):
            not_p.append(np.asarray(ex[0], dtype=np.int64))
    has_base = bool(
        base.must or base.should or base.multi or base.filters
        or base.must_groups
    )
    # a should-only base is required ONLY when nothing else can satisfy
    # the query (no must phrase to gate on, no should phrase to union
    # with) — otherwise flat SHOULD clauses, term or phrase, are a union
    base_required = bool(
        base.must or base.filters or base.multi or base.must_groups
    ) or (bool(base.should) and not must_p and not should_p)
    base_scored = None
    if has_base:
        r = _exhaustive_candidates(reader, base)
        if r is not None and len(r[0]):
            base_scored = (
                np.asarray(r[0], dtype=np.int64),
                np.asarray(r[1]),
            )
        elif base_required:
            return empty
    cand, acc = _combine_clauses(
        base_scored, base_required, must_p, should_p, not_p, dtype
    )
    return cand, acc, dtype


def _combine_clauses(base_scored, base_required, must_p, should_p, not_p,
                     dtype):
    """The BooleanQuery-level clause combination, shared by the global
    exhaustive path (:func:`_clauses_candidates`) and the pruned tree
    executor's doc-range slices (per-doc semantics and float accumulation
    are range-local, so slicing every input to [lo, hi) yields exactly
    the global result restricted to the range).  ``base_scored`` is
    (docs, scores) or None (absent base or no matches), ``must_p`` /
    ``should_p`` are scored clause lists in canonical order, ``not_p``
    sorted doc arrays to exclude.  -> (cand, acc)."""
    empty = (np.empty(0, np.int64), np.empty(0, dtype=dtype))
    for d, _ in must_p:
        if len(d) == 0:
            return empty
    if base_required and base_scored is None:
        return empty
    req = [d for d, _ in must_p]
    if base_required and base_scored is not None:
        req.append(base_scored[0])
    if req:
        cand = req[0]
        for d in req[1:]:
            cand = np.intersect1d(cand, d, assume_unique=True)
            if len(cand) == 0:
                return empty
    else:
        pools = [d for d, _ in should_p]
        if base_scored is not None:
            pools.append(base_scored[0])
        pools = [p for p in pools if len(p)]
        if not pools:
            return empty
        cand = np.unique(np.concatenate(pools))
    for nd in not_p:
        if len(nd) and len(cand):
            pos = np.minimum(np.searchsorted(nd, cand), len(nd) - 1)
            cand = cand[nd[pos] != cand]
    if len(cand) == 0:
        return empty
    acc = np.zeros(len(cand), dtype=dtype)

    def add(docs, scores):
        if len(docs) == 0:
            return
        pos = np.minimum(np.searchsorted(docs, cand), len(docs) - 1)
        hit = docs[pos] == cand
        acc[hit] += scores[pos[hit]].astype(dtype, copy=False)

    if base_scored is not None:
        add(*base_scored)
    for d, s in must_p:
        add(d, s)
    for d, s in should_p:
        add(d, s)
    return cand, acc


def _exhaustive_candidates(reader, query, _prep=None):
    """Shared exhaustive body -> (cand, acc, dtype) or None (no possible
    match). Uses the dense bulk accumulator when the searcher's doc space
    allows, the sparse unique/searchsorted combine otherwise."""
    if isinstance(query, MixedQuery):
        return _mixed_candidates(reader, query)
    if isinstance(query, NestedQuery):
        return _nested_candidates(reader, query)
    if isinstance(query, SynonymQuery):
        return _synonym_scored(reader, query)
    if isinstance(query, MultiPhrase):
        return _multi_phrase_scored(reader, query)
    if isinstance(query, PhraseQuery):
        return _phrase_scored(reader, query)
    if isinstance(query, MatchAllQuery):
        dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
        docs = np.asarray(reader.all_doc_ids(), dtype=np.int64)
        deleted = getattr(reader, "deleted", None)
        if deleted is not None and len(deleted) and len(docs):
            pos = np.minimum(np.searchsorted(deleted, docs), len(deleted) - 1)
            docs = docs[deleted[pos] != docs]
        return docs, np.ones(len(docs), dtype=dtype), dtype
    prep = _prep if _prep is not None else _prepare(reader, query)
    if prep is None:
        return None
    cursors, is_must, not_cursors, dtype, groups = prep
    filters = getattr(query, "filters", ())
    if groups:
        return _group_candidates(
            reader, query, cursors, is_must, not_cursors, dtype, groups,
            filters,
        )
    if len(cursors) == 0:
        # pure-filter query (only range FILTER clauses): matches every doc
        # passing the filters, scoring 0 — reference FILTER-occur semantics
        if filters and not (
            getattr(query, "must", ())
            or getattr(query, "should", ())
            or getattr(query, "multi", ())
        ):
            fdocs = reader.filter_docs(filters)
            if fdocs is None:
                return None
            deleted = getattr(reader, "deleted", None)
            if deleted is not None and len(deleted) and len(fdocs):
                pos = np.minimum(
                    np.searchsorted(deleted, fdocs), len(deleted) - 1
                )
                fdocs = fdocs[deleted[pos] != fdocs]
            not_docs = _NotCursorView.all_docs(not_cursors)
            if not_docs is not None and len(not_docs) and len(fdocs):
                pos = np.minimum(
                    np.searchsorted(not_docs, fdocs), len(not_docs) - 1
                )
                fdocs = fdocs[not_docs[pos] != fdocs]
            return fdocs, np.zeros(len(fdocs), dtype=dtype), dtype
        return None
    per_term = [c.decode_all() for c in cursors]
    not_docs = _NotCursorView.all_docs(not_cursors)
    msm = (
        query.minimum_should_match if isinstance(query, BooleanQuery) else 0
    )
    n_must = int(is_must.sum())
    doc_space = int(reader.doc_count)
    max_doc = max((int(d[-1]) for d, _ in per_term if len(d)), default=-1)
    # single scoring term, no exclusions: the posting list IS the sorted
    # unique candidate set — skip the dense accumulator entirely
    if (
        len(per_term) == 1
        and (not_docs is None or len(not_docs) == 0)
        and ((n_must == 0 and msm <= 1) or (n_must == 1 and msm == 0))
    ):
        cand, acc = _combine(per_term, is_must, n_must, msm, not_docs, dtype)
    elif 0 < doc_space <= DENSE_DOC_LIMIT and max_doc < doc_space:
        pos_scores = all(
            c._full_min is not None and c._full_min > 0 for c in cursors
        )
        cand, acc = _dense_combine(
            per_term, is_must, n_must, msm, not_docs, dtype, doc_space,
            pos_scores=pos_scores,
        )
    else:
        cand, acc = _combine(
            per_term, is_must, n_must, msm, not_docs, dtype
        )
    if filters and len(cand):
        # FILTER-occur intersection: range docs are sorted unique
        fdocs = reader.filter_docs(filters)
        if fdocs is None or len(fdocs) == 0:
            return cand[:0], acc[:0], dtype
        pos = np.minimum(np.searchsorted(fdocs, cand), len(fdocs) - 1)
        keep = fdocs[pos] == cand
        cand, acc = cand[keep], acc[keep]
    return cand, acc, dtype


#: champion-list length — the exact top-CHAMPION_K of a single term under
#: (score desc, doc asc) is query-independent, so a warm reader caches it
#: once per term ("champion lists" / impact-ordered fidelity lists, a
#: standard static-pruning structure; exact for any k <= CHAMPION_K
#: because the cached list IS the prefix of the total order)
CHAMPION_K = 1024


def _champion_topk(reader, cursor, k: int):
    champs = reader.__dict__.setdefault("_champions", LruDict(4096))
    key = (cursor.term, cursor.scorer.cache_key())
    hit = champs.get(key)
    if hit is None:
        docs, scores = cursor.decode_all()
        hit = _topk_from(docs, scores, CHAMPION_K)
        champs[key] = hit
    return (
        np.asarray(hit[0][:k], dtype=np.int64).copy(),
        hit[1][:k].copy(),
    )


def _single_term_shortcut(prep, query, k: int):
    """-> cursor if the query is a pure single-term top-k a champion list
    answers exactly, else None."""
    cursors, is_must, not_cursors, _, groups = prep
    if len(cursors) != 1 or not_cursors or groups or not (0 < k <= CHAMPION_K):
        return None
    if getattr(query, "filters", ()):
        return None  # champion lists are unfiltered prefixes
    msm = getattr(query, "minimum_should_match", 0)
    n_must = int(is_must.sum())
    if (n_must == 0 and msm <= 1) or (n_must == 1 and msm == 0):
        return cursors[0]
    return None


def score_exhaustive(reader, query, k: int = 10, _prep=None):
    """Decode-everything executor — the in-engine oracle. ``_prep`` lets
    score_blockmax's cost-based fallback reuse its already-built cursors."""
    if isinstance(query, (PhraseQuery, MatchAllQuery, MixedQuery,
                           NestedQuery, SynonymQuery, MultiPhrase)):
        r = _exhaustive_candidates(reader, query)
        if r is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        cand, acc, _ = r
        return _topk_from(cand, acc, k)
    prep = _prep if _prep is not None else _prepare(reader, query)
    if prep is None:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    single = _single_term_shortcut(prep, query, k)
    if single is not None:
        return _champion_topk(reader, single, k)
    r = _exhaustive_candidates(reader, query, _prep=prep)
    if r is None:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    cand, acc, _ = r
    return _topk_from(cand, acc, k)


def score_dismax(reader, query: DisMaxQuery, k: int = 10):
    """DisjunctionMaxQuery executor: per doc, max matching term score plus
    ``tie_breaker`` times the remaining matching scores (reference:
    search/DisjunctionMaxQuery.java, DisjunctionMaxScorer.java). Max and
    sum accumulate densely per term in canonical sorted-term order; the
    final combine is one vectorized expression."""
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype))
    if k <= 0:
        return empty
    full_cache = reader.__dict__.setdefault("_scored_full", LruDict(512))
    deleted = getattr(reader, "deleted", None)
    cursors = []
    for t in sorted(set(query.terms)):
        df, ttf = reader.term_stats(t)
        if df == 0:
            continue
        # _term_scorer honors the searcher's similarity selection and
        # custom (k1, b) — IndexSearcher.setSimilarity applies to EVERY
        # query kind, DisjunctionMax included (a direct make_scorer call
        # here used to silently pin default BM25)
        scorer = _term_scorer(reader, df, ttf)
        cursors.append(
            TermCursor(t, reader.postings(t), scorer, full_cache,
                       deleted=deleted)
        )
    if not cursors:
        return empty
    per_term = [c.decode_all() for c in cursors]
    tie = np.dtype(dtype).type(query.tie_breaker)
    if len(per_term) == 1:
        docs, scores = per_term[0]
        return _topk_from(docs, scores.astype(dtype, copy=False), k)
    doc_space = int(reader.doc_count)
    max_doc = max((int(d[-1]) for d, _ in per_term if len(d)), default=-1)
    if 0 < doc_space <= DENSE_DOC_LIMIT and max_doc < doc_space:
        # when every clause's min score is positive, matched == acc_max > 0
        # exactly (max of positives is positive) — skip the count scatter
        pos = all(
            c._full_min is not None and c._full_min > 0 for c in cursors
        )
        acc_sum = np.zeros(doc_space, dtype=dtype)
        # -inf so negative per-clause scores (Indri-family) take the true
        # max; matched docs always overwrite it, and the positive-scores
        # shortcut below still reads matched docs as > 0
        acc_max = np.full(doc_space, -np.inf, dtype=dtype)
        cnt = None if pos else np.zeros(doc_space, dtype=np.uint8)
        for docs, scores in per_term:
            if len(docs) == 0:
                continue
            s = scores.astype(dtype, copy=False)
            acc_sum[docs] += s
            # docs are unique within a term, so gather-max-scatter is exact
            acc_max[docs] = np.maximum(acc_max[docs], s)
            if cnt is not None:
                cnt[docs] += 1
        cand = np.flatnonzero(acc_max > 0 if cnt is None else cnt)
        m = acc_max[cand]
        score = m + tie * (acc_sum[cand] - m)
    else:
        cand, score = _disjunction_combine(per_term, tie, dtype)
    return _topk_from(cand, score, k)


def _disjunction_combine(per_term, tie, dtype, rewrite: str = "dismax"):
    """Sparse disjunction combine over scored per-clause lists -> (cand,
    score). ``dismax`` = max + tie * (sum - max) (DisjunctionMaxScorer);
    ``boolean`` = plain SHOULD sum. acc_max initializes to -inf so
    NEGATIVE per-clause scores (Indri-family similarities) combine
    correctly — every candidate matches >= 1 clause by construction, so
    no -inf survives. Shared by score_dismax and score_blended."""
    alld = np.concatenate([d for d, _ in per_term])
    cand = np.unique(alld)
    acc_sum = np.zeros(len(cand), dtype=dtype)
    acc_max = np.full(len(cand), -np.inf, dtype=dtype)
    for docs, scores in per_term:
        if len(docs) == 0:
            continue
        pos = np.searchsorted(docs, cand)
        pos_c = np.minimum(pos, len(docs) - 1)
        hit = docs[pos_c] == cand
        s = scores[pos_c[hit]].astype(dtype, copy=False)
        acc_sum[hit] += s
        acc_max[hit] = np.maximum(acc_max[hit], s)
    if rewrite == "boolean":
        return cand, acc_sum
    return cand, acc_max + tie * (acc_sum - acc_max)


def score_blended(reader, query: BlendedTermQuery, k: int = 10):
    """BlendedTermQuery executor: blended stats (df = max, ttf = sum)
    feed ONE scorer family, each term scores its own postings with its
    own boost, and the RewriteMethod combines — boolean = SHOULD sum in
    sorted-term order (the flat executor's canonical accumulation),
    dismax = max + tie * rest (DisjunctionMaxScorer, same combine as
    :func:`score_dismax`)."""
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype))
    if k <= 0 or not query.terms:
        return empty
    boosts = (
        query.boosts if query.boosts else (1.0,) * len(query.terms)
    )
    if len(boosts) != len(query.terms):
        raise ValueError("boosts must pair 1:1 with terms")
    # ttf sums over the CLAUSES (a duplicated term contributes twice),
    # df maxes — BlendedTermQuery.rewrite():281-292 iterates contexts
    df_blend, ttf_blend = 0, 0
    stats = {}
    for t in query.terms:
        if t not in stats:
            stats[t] = reader.term_stats(t)
        df, ttf = stats[t]
        df_blend = max(df_blend, df)
        ttf_blend += ttf
    if df_blend == 0:
        return empty
    deleted = getattr(reader, "deleted", None)
    full_cache = reader.__dict__.setdefault("_scored_full", LruDict(512))
    # one scored list PER CLAUSE: like the reference's rewritten
    # disjunction, a duplicated term scores once per occurrence with its
    # own boost (set-collapsing would diverge from the clause list)
    per_term = []
    for t, b in zip(query.terms, boosts):
        if stats[t][0] == 0:
            continue
        # the warm cache keys on (term, scorer.cache_key()) — blended df
        # and per-term boost are scorer params, so entries never collide
        # with the term's unblended lists
        scorer = _term_scorer(reader, df_blend, ttf_blend, float(b))
        cursor = TermCursor(t, reader.postings(t), scorer, full_cache,
                            deleted=deleted)
        per_term.append(cursor.decode_all())
    tie = np.dtype(dtype).type(query.tie_breaker)
    cand, score = _disjunction_combine(
        per_term, tie, dtype, rewrite=query.rewrite
    )
    return _topk_from(cand, score, k)


def matching_docs(reader, query) -> np.ndarray:
    """ALL matching doc IDs, ascending — the total-hits / facet-candidate
    enumeration (reference: IndexSearcher.count,
    core/.../search/IndexSearcher.java, and facet collection over every hit,
    facet/.../FacetsCollector.java)."""
    r = _exhaustive_candidates(reader, query)
    if r is None:
        return np.empty(0, dtype=np.int64)
    return np.asarray(r[0], dtype=np.int64)


def count_matches(reader, query) -> int:
    """Total hit count (IndexSearcher.count analogue)."""
    return int(len(matching_docs(reader, query)))


def score_after(reader, query, k: int = 10, after=None):
    """searchAfter paging: top-k strictly AFTER the ``after =
    (score, doc_id)`` anchor in the (score desc, doc asc) total order
    (reference: IndexSearcher.searchAfter, used by the demo's result
    paging, demo/.../SearchFiles.java). ``after=None`` == first page."""
    if after is None:
        return score_exhaustive(reader, query, k)
    r = _exhaustive_candidates(reader, query)
    if r is None:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    cand, acc, _ = r
    a_s = np.float64(after[0])
    a_d = int(after[1])
    s64 = acc.astype(np.float64)
    mask = (s64 < a_s) | ((s64 == a_s) & (np.asarray(cand) > a_d))
    return _topk_from(cand[mask], acc[mask], k)


def score_constant(reader, query, k: int = 10, boost: float = 1.0):
    """ConstantScoreQuery: every matching doc scores ``boost`` (reference:
    search/ConstantScoreQuery.java — the wrapped query contributes matches,
    not scores). With all scores equal, top-k under (score desc, doc asc)
    is simply the k smallest matching doc IDs."""
    docs = matching_docs(reader, query)[: max(k, 0)]
    return docs, np.full(len(docs), boost, dtype=np.float32)


def _posting_payload(cursor: TermCursor, doc_id: int):
    """(tf, norm_key) of ``doc_id`` in this cursor's postings, or None."""
    for tp in cursor._parts:
        d, tfs, keys = tp.decode_all()
        i = int(np.searchsorted(d, doc_id))
        if i < len(d) and d[i] == doc_id:
            return int(tfs[i]), int(keys[i])
    return None


def explain(reader, query, doc_id: int) -> dict:
    """Per-hit score decomposition (reference: search/Explanation.java and
    BM25Similarity.explain — "score(freq), computed as boost * idf * tf /
    (tf + k1*(1-b+b*dl/avgdl))"). Returns

        {"match": bool, "value": float, "details": [
            {"term", "value", "tf", "norm_key", "doc_freq", "idf",
             "weight", "k1", "b", "avgdl"}, ...]}

    ``value`` accumulates in the SAME canonical sorted-term order and dtype
    as the executors, so explain(doc).value == the doc's top-k score
    bit-for-bit (the CheckHits validation pattern, tested in pytest)."""
    no_match = {"match": False, "value": 0.0, "details": []}
    if isinstance(query, PhraseQuery):
        r = _phrase_scored(reader, query)
        if r is None:
            return no_match
        docs, scores, _ = r
        i = int(np.searchsorted(docs, doc_id))
        if i >= len(docs) or int(docs[i]) != int(doc_id):
            return no_match
        return {
            "match": True,
            "value": float(scores[i]),
            "details": [
                {"term": " ".join(query.terms), "value": float(scores[i])}
            ],
        }
    prep = _prepare(reader, query)
    if prep is None:
        return no_match
    cursors, is_must, not_cursors, dtype, groups = prep
    allc = sorted(
        list(cursors) + [c for g in groups for c in g], key=lambda c: c.term
    )
    details = []
    total = np.zeros(1, dtype=dtype)
    for c in allc:
        docs, scores = c.decode_all()
        i = int(np.searchsorted(docs, doc_id))
        if i >= len(docs) or docs[i] != doc_id:
            continue
        payload = _posting_payload(c, doc_id)
        tf, key = payload if payload is not None else (0, 0)
        sc = c.scorer
        total[0] += scores[i]
        details.append(
            {
                "term": c.term,
                "value": float(scores[i]),
                "tf": tf,
                "norm_key": key,
                "doc_freq": int(c.df),
                "idf": float(sc.idf),
                "weight": float(sc.weight),
                "k1": float(sc.k1),
                "b": float(sc.b),
                "avgdl": float(sc.avgdl),
            }
        )
    # candidacy under the full boolean/filter/liveDocs semantics
    cand = matching_docs(reader, query)
    pos = int(np.searchsorted(cand, doc_id))
    match = pos < len(cand) and int(cand[pos]) == int(doc_id)
    if not match:
        return {"match": False, "value": 0.0, "details": details}
    return {"match": True, "value": float(total[0]), "details": details}


def score_boost_by_field(
    reader, query, field: str, weight: float = 1.0, scale: float = 1.0,
    offset: int = 0, k: int = 10,
) -> Tuple[np.ndarray, np.ndarray]:
    """Function-scored query: final = BM25 + weight * ((docvalue - offset)
    / scale) — the FunctionScoreQuery + DoubleValuesSource.fromLongField
    analogue (reference: queries/.../function/FunctionScoreQuery.java,
    search/DoubleValuesSource.java; the recency-boost idiom). Candidates
    and BM25 sums are the boolean executor's; the additive term is a pure
    per-doc formula so distributed evaluation stays embarrassingly
    parallel. Returns (docs, boosted float64 scores) top-k."""
    r = _exhaustive_candidates(reader, query)
    if r is None:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    cand, acc, _ = r
    cand = np.asarray(cand, dtype=np.int64)
    if len(cand) == 0:
        return cand, np.empty(0, dtype=np.float64)
    dv = np.asarray(reader.doc_values_for(field, cand), dtype=np.float64)
    boosted = acc.astype(np.float64) + weight * ((dv - offset) / scale)
    return _topk_from(cand, boosted, k)


def common_terms_query(reader, terms, max_doc_freq: int) -> BooleanQuery:
    """CommonTermsQuery (reference: queries/src/java/org/apache/lucene/
    queries/CommonTermsQuery.java): terms are split by document frequency
    at ``max_doc_freq`` — LOW-frequency terms form the match clause (a
    required-OR group, lowFreqOccur=SHOULD with minimumNumberShouldMatch=1),
    HIGH-frequency (stopword-ish) terms only boost scores of docs already
    matched. With no low-frequency term present the high-frequency terms
    become the match clause themselves (the reference's fallback). Terms
    absent from the index are dropped."""
    low, high = [], []
    for t in dict.fromkeys(terms):  # de-dup, keep order
        df, _ = reader.term_stats(t)
        if df == 0:
            continue
        (low if df <= max_doc_freq else high).append(t)
    if not low:
        return BooleanQuery(should=tuple(high))
    return BooleanQuery(should=tuple(high), must_groups=(tuple(low),))


#: FeatureField score functions (reference: document/FeatureField.java —
#: newSaturationQuery / newLogQuery / newSigmoidQuery). Each maps a
#: non-negative static feature v to a bounded relevance term.
FEATURE_FUNCTIONS = ("saturation", "log", "sigmoid")


def score_feature(
    reader,
    query,
    field: str,
    function: str = "saturation",
    weight: float = 1.0,
    pivot: float = 1.0,
    scale: float = 1.0,
    exponent: float = 1.0,
    k: int = 10,
) -> Tuple[np.ndarray, np.ndarray]:
    """FeatureQuery analogue: final = BM25 + weight * F(v) where v is a
    non-negative doc-values feature (pagerank-ish static signal) and F is

    * ``saturation``: v / (v + pivot)           (SaturationFunction)
    * ``log``:        ln(scale + v)             (LogFunction)
    * ``sigmoid``:    v^a / (v^a + pivot^a)     (SigmoidFunction, a=exponent)

    The reference indexes features as term frequencies inside a special
    field and scores them through the same impact machinery; here the
    feature is a doc-values column and the additive term is a pure
    per-doc formula (frozen op order for the SQL oracle). Returns
    (docs, float64 scores) top-k by (score desc, doc asc)."""
    if function not in FEATURE_FUNCTIONS:
        raise ValueError(f"function must be one of {FEATURE_FUNCTIONS}")
    r = _exhaustive_candidates(reader, query)
    if r is None:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    cand, acc, _ = r
    cand = np.asarray(cand, dtype=np.int64)
    if len(cand) == 0:
        return cand, np.empty(0, dtype=np.float64)
    v = np.asarray(reader.doc_values_for(field, cand), dtype=np.float64)
    if function == "saturation":
        f = v / (v + pivot)
    elif function == "log":
        f = np.log(scale + v)
    else:
        va = v ** exponent
        f = va / (va + pivot ** exponent)
    boosted = acc.astype(np.float64) + weight * f
    return _topk_from(cand, boosted, k)


def score_sort_by_field(
    reader, query, field: str, k: int = 10, descending: bool = True,
    after: Optional[Tuple[int, int]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sort-by-field top-k: matching docs ordered by (doc-values field
    desc|asc, doc asc) — the TopFieldCollector / Sort analogue (reference:
    search/TopFieldCollector.java, search/Sort.java, SortField.java).
    ``after = (value, doc_id)`` pages strictly past the anchor in the same
    total order (searchAfter on a field sort). Returns (docs, values)."""
    docs = matching_docs(reader, query)
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if len(docs) == 0 or k <= 0:
        return empty
    vals = np.asarray(reader.doc_values_for(field, docs), dtype=np.int64)
    if after is not None:
        a_v, a_d = int(after[0]), int(after[1])
        if descending:
            mask = (vals < a_v) | ((vals == a_v) & (docs > a_d))
        else:
            mask = (vals > a_v) | ((vals == a_v) & (docs > a_d))
        docs, vals = docs[mask], vals[mask]
    order = np.lexsort((docs, -vals if descending else vals))[:k]
    return np.asarray(docs[order], dtype=np.int64), vals[order]


def score_sort_by_fields(
    reader,
    query,
    fields: Sequence[Tuple[str, bool]],
    k: int = 10,
    after: Optional[Tuple[Tuple[int, ...], int]] = None,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Multi-field sort: matching docs ordered by each ``(field,
    descending)`` in turn, doc asc last — a Sort with several SortFields
    (reference: search/Sort.java takes a SortField[] and
    TopFieldCollector compares them left to right). ``after =
    ((v1, .., vn), doc_id)`` pages strictly past the anchor in the same
    total order. Returns (docs, [values per field])."""
    docs = matching_docs(reader, query)
    if len(docs) == 0 or k <= 0 or not fields:
        return np.empty(0, dtype=np.int64), [
            np.empty(0, dtype=np.int64) for _ in fields
        ]
    cols = [
        np.asarray(reader.doc_values_for(f, docs), dtype=np.int64)
        for f, _ in fields
    ]
    if after is not None:
        a_vals, a_doc = after
        # strictly-after in lexicographic (fields..., doc asc) order
        gt = np.zeros(len(docs), dtype=bool)
        eq = np.ones(len(docs), dtype=bool)
        for (f, desc), col, av in zip(fields, cols, a_vals):
            av = int(av)
            later = (col < av) if desc else (col > av)
            gt |= eq & later
            eq &= col == av
        gt |= eq & (docs > int(a_doc))
        docs = docs[gt]
        cols = [c[gt] for c in cols]
    keys = [docs] + [
        (-c if desc else c) for (f, desc), c in zip(fields, cols)
    ][::-1]
    order = np.lexsort(tuple(keys))[:k]
    return (
        np.asarray(docs[order], dtype=np.int64),
        [c[order] for c in cols],
    )


class _RawSynCursor:
    """Raw (unscored) block cursor over one synonym member's bucket blobs:
    per-block skip arrays plus the per-block max tf and MIN norm key read
    straight off the stored impact frontier (tf-ascending frontiers have
    strictly increasing keys, so max tf = last tf and min key = first
    key — the block's true extremes, since the minimal-key and maximal-tf
    pairs are never dominated)."""

    def __init__(self, postings_list):
        self._parts = postings_list
        nbs = [tp.n_blocks for tp in postings_list]
        self._part_id = np.repeat(
            np.arange(len(postings_list), dtype=np.int32), nbs
        )
        self._local_b = (
            np.concatenate([np.arange(nb, dtype=np.int32) for nb in nbs])
            if nbs
            else np.empty(0, dtype=np.int32)
        )
        firsts, lasts, btf, bkey = [], [], [], []
        for tp in postings_list:
            firsts.append(tp.first_docs)
            lasts.append(tp.last_docs)
            for lb in range(tp.n_blocks):
                btf.append(int(tp.frontier_tfs[lb][-1]))
                bkey.append(int(tp.frontier_keys[lb][0]))
        self.first_docs = (
            np.concatenate(firsts) if firsts else np.empty(0, np.int64)
        )
        self.last_docs = (
            np.concatenate(lasts) if lasts else np.empty(0, np.int64)
        )
        self.block_max_tf = np.asarray(btf, dtype=np.int64)
        self.block_min_key = np.asarray(bkey, dtype=np.int64)

    @property
    def n_blocks(self) -> int:
        return len(self._part_id)

    def raw_in(self, lo: int, hi: int):
        """(docs, tfs, keys) with lo <= doc <= hi via block skip data."""
        e = np.empty(0, dtype=np.int64)
        if self.n_blocks == 0:
            return e, e, e
        b0 = int(np.searchsorted(self.last_docs, lo))
        b1 = int(np.searchsorted(self.first_docs, hi, side="right"))
        out = []
        for b in range(b0, b1):
            pi, lb = int(self._part_id[b]), int(self._local_b[b])
            docs, tfs, keys = self._parts[pi].decode_block(lb)
            i = int(np.searchsorted(docs, lo))
            j = int(np.searchsorted(docs, hi, side="right"))
            if i < j:
                out.append((docs[i:j], tfs[i:j], keys[i:j]))
        if not out:
            return e, e, e
        return (
            np.concatenate([o[0] for o in out]),
            np.concatenate([o[1] for o in out]),
            np.concatenate([o[2] for o in out]),
        )


def _phrase_blockmax(reader, phrase: "PhraseQuery", k: int):
    """Pruned executor for EXACT phrases (slop=0) — the impacts-driven
    phrase pruning the reference gets from ExactPhraseMatcher's
    ImpactsSource (core/.../search/PhraseWeight.java + the impacts
    merging in ExactPhraseMatcher.java): per-doc phrase freq is at most
    the MIN of the member tfs, so an interval's upper bound is
    scorer(min over terms of the active block-max tf, min active block
    norm key); feasibility needs every term active. Per-interval
    evaluation slices each term's cached packed-key array to the doc
    range and runs the SAME iterated sorted intersection, so per-doc
    freqs — and the single score application — are bit-identical to
    :func:`_phrase_scored`."""
    import math

    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype))
    k1, b = getattr(reader, "bm25_params", (1.2, 0.75))
    pad = max(phrase.offsets) + 1
    idf64 = 0.0
    raws = []
    shifted = []
    for t, off in zip(phrase.terms, phrase.offsets):
        df, _ = reader.term_stats(t)
        if df == 0:
            return empty
        idf64 += math.log(
            1.0 + (reader.doc_count - df + 0.5) / (df + 0.5)
        )
        base, max_pos = _packed_pos_keys(reader, t)
        if max_pos + pad >= (1 << _POS_SHIFT):
            raise ValueError("document too long for phrase key packing")
        shifted.append((base + np.int64(pad - off), np.int64(pad - off)))
        raws.append(_raw_cursor(reader, t))
    if any(r.n_blocks == 0 for r in raws):
        return empty
    if sum(r.n_blocks for r in raws) <= 32:
        # tiny posting lists: one vectorized global pass wins outright,
        # skip even the bound computation
        _set_path("exhaustive:small")
        got = _phrase_scored(reader, phrase)
        if got is None:
            return empty
        return _topk_from(got[0], got[1], k)
    scorer = make_scorer(
        reader.norm_kind, reader.doc_count, reader.sum_total_tf, 1,
        k1=k1, b=b,
    )
    if reader.norm_kind == "byte4":
        scorer.idf = np.float32(idf64)
        scorer.weight = np.float32(idf64)
    else:
        scorer.idf = idf64
        scorer.weight = idf64
    edges = np.unique(
        np.concatenate(
            [r.first_docs for r in raws] + [r.last_docs + 1 for r in raws]
        )
    )
    starts = edges[:-1]
    tf_bound = np.full(len(starts), np.iinfo(np.int64).max, dtype=np.int64)
    key_min = np.full(len(starts), np.iinfo(np.int64).max, dtype=np.int64)
    feasible = np.ones(len(starts), dtype=bool)
    for r in raws:
        idx = np.searchsorted(r.last_docs, starts)
        idx_c = np.minimum(idx, r.n_blocks - 1)
        act = r.first_docs[idx_c] <= starts
        feasible &= act
        tf_bound = np.where(
            act, np.minimum(tf_bound, r.block_max_tf[idx_c]), tf_bound
        )
        key_min = np.where(
            act, np.minimum(key_min, r.block_min_key[idx_c]), key_min
        )
    n_feasible = int(feasible.sum())
    if n_feasible <= 32:
        # few intervals -> per-interval overhead exceeds one vectorized
        # global pass (the small-corpus / low-df regime); at scale the
        # interval count grows with df and pruning wins
        _set_path("exhaustive:small")
        got = _phrase_scored(reader, phrase)
        if got is None:
            return empty
        return _topk_from(got[0], got[1], k)
    bounds = np.zeros(len(starts), dtype=np.float64)
    if feasible.any():
        bounds[feasible] = scorer.bound_array(
            tf_bound[feasible], np.where(feasible, key_min, 0)[feasible]
        ).astype(np.float64)
    pad_f = (
        1.0 + 4 * 2.0 ** -23 if dtype == np.float32 else 1.0 + 2.0 ** -40
    )
    bounds = bounds * pad_f
    deleted = getattr(reader, "deleted", None)
    order = np.argsort(-bounds, kind="stable")
    heap: List[Tuple[float, int]] = []
    probed = 0
    for i in order:
        if not feasible[i]:
            continue
        if len(heap) == k and bounds[i] < heap[0][0]:
            break
        if probed == 8 and n_feasible > 64:
            thr = heap[0][0] if len(heap) == k else -np.inf
            alive = int((bounds[feasible] >= thr).sum())
            if alive > 0.25 * n_feasible:
                _set_path("exhaustive:cost-fallback")
                got = _phrase_scored(reader, phrase)
                if got is None:
                    return empty
                return _topk_from(got[0], got[1], k)
        probed += 1
        lo = int(starts[i])
        hi = int(edges[i + 1]) - 1
        inter = None
        for keys, c in shifted:
            s0 = int(np.searchsorted(keys, (lo << _POS_SHIFT) + int(c)))
            s1 = int(
                np.searchsorted(keys, ((hi + 1) << _POS_SHIFT) + int(c))
            )
            sl = keys[s0:s1]
            if inter is None:
                inter = sl
            else:
                if len(inter) == 0 or len(sl) == 0:
                    inter = inter[:0]
                    break
                pos = np.minimum(np.searchsorted(sl, inter), len(sl) - 1)
                inter = inter[sl[pos] == inter]
        if inter is None or len(inter) == 0:
            continue
        occ_docs = inter >> np.int64(_POS_SHIFT)
        docs_u, pf = np.unique(occ_docs, return_counts=True)
        if deleted is not None and len(deleted) and len(docs_u):
            dpos = np.minimum(
                np.searchsorted(deleted, docs_u), len(deleted) - 1
            )
            keep = deleted[dpos] != docs_u
            docs_u, pf = docs_u[keep], pf[keep]
        if len(docs_u) == 0:
            continue
        norm_keys = _gather_norm_keys(reader, phrase.terms[0], docs_u)
        acc = scorer.score_array(pf, norm_keys).astype(dtype, copy=False)
        if len(heap) == k:
            mask = acc.astype(np.float64) >= heap[0][0]
            docs_u, acc = docs_u[mask], acc[mask]
        for d, s in zip(docs_u, acc):
            entry = (float(s), -int(d))
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return (
        np.array([-e[1] for e in out], dtype=np.int64),
        np.array([e[0] for e in out], dtype=dtype),
    )


def _sloppy_blockmax(reader, phrase: "PhraseQuery", k: int):
    """Pruned executor for SLOPPY phrases (slop > 0) — the last
    positional shape that used to route exhaustive. The bound: every
    match is anchored at one position of the FIRST term and weighs at
    most 1 (sloppyWeight 1/(1+L) <= 1), so a doc's float freq is at most
    the anchor term's tf; an interval therefore carries
    ``scorer(anchor block-max tf, min active norm key)`` with
    every-term-active feasibility (candidates need the boolean AND).
    Per-interval evaluation slices every term's (docs, tfs, positions)
    arrays to the doc range and runs the SAME :func:`_sloppy_freqs`
    kernel — the per-anchor smallest-range sweep is doc-local, so
    per-doc float freqs, the norm gather and the single score
    application are bit-identical to the global pass."""
    import math

    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype))
    k1, b = getattr(reader, "bm25_params", (1.2, 0.75))
    idf64 = 0.0
    pos_cache: Dict[str, tuple] = {}
    pstarts: Dict[str, np.ndarray] = {}
    raws = []
    for t in phrase.terms:
        df, _ = reader.term_stats(t)
        if df == 0:
            return empty
        idf64 += math.log(
            1.0 + (reader.doc_count - df + 0.5) / (df + 0.5)
        )
        if t not in pos_cache:
            hit = _term_positions_cached(reader, t)
            pos_cache[t] = hit[:3]
            pstarts[t] = hit[3]
        raws.append(_raw_cursor(reader, t))
    if any(r.n_blocks == 0 for r in raws):
        return empty
    if sum(r.n_blocks for r in raws) <= 32:
        _set_path("exhaustive:small")
        got = _phrase_scored(reader, phrase)
        if got is None:
            return empty
        return _topk_from(got[0], got[1], k)
    scorer = make_scorer(
        reader.norm_kind, reader.doc_count, reader.sum_total_tf, 1,
        k1=k1, b=b,
    )
    if reader.norm_kind == "byte4":
        scorer.idf = np.float32(idf64)
        scorer.weight = np.float32(idf64)
    else:
        scorer.idf = idf64
        scorer.weight = idf64
    edges = np.unique(
        np.concatenate(
            [r.first_docs for r in raws] + [r.last_docs + 1 for r in raws]
        )
    )
    starts = edges[:-1]
    tf_bound = np.zeros(len(starts), dtype=np.int64)
    key_min = np.full(len(starts), np.iinfo(np.int64).max, dtype=np.int64)
    feasible = np.ones(len(starts), dtype=bool)
    for ti, r in enumerate(raws):
        idx = np.searchsorted(r.last_docs, starts)
        idx_c = np.minimum(idx, r.n_blocks - 1)
        act = r.first_docs[idx_c] <= starts
        feasible &= act
        if ti == 0:  # the anchor term's tf bounds the weighted freq
            tf_bound = np.where(act, r.block_max_tf[idx_c], 0)
        key_min = np.where(
            act, np.minimum(key_min, r.block_min_key[idx_c]), key_min
        )
    n_feasible = int(feasible.sum())
    if n_feasible <= 32:
        _set_path("exhaustive:small")
        got = _phrase_scored(reader, phrase)
        if got is None:
            return empty
        return _topk_from(got[0], got[1], k)
    bounds = np.zeros(len(starts), dtype=np.float64)
    if feasible.any():
        bounds[feasible] = scorer.bound_array(
            tf_bound[feasible], np.where(feasible, key_min, 0)[feasible]
        ).astype(np.float64)
    pad_f = (
        1.0 + 4 * 2.0 ** -23 if dtype == np.float32 else 1.0 + 2.0 ** -40
    )
    bounds = bounds * pad_f
    # zero-probe fallback pre-check (sloppy probes run the Python
    # smallest-range sweep, so a wasted probe is far costlier than the
    # exact executor's vectorized slice): with the heap OPTIMALLY filled
    # by the top-k bounds the true surviving fraction can only be larger
    # (scores <= bounds), so if even that exceeds the 25% budget the
    # cost fallback is a guaranteed outcome — take it before probing
    if n_feasible > 64:
        fb = np.sort(bounds[feasible])
        thr_opt = fb[max(0, n_feasible - k)]
        if int((fb >= thr_opt).sum()) > 0.25 * n_feasible:
            _set_path("exhaustive:cost-fallback")
            got = _phrase_scored(reader, phrase)
            if got is None:
                return empty
            return _topk_from(got[0], got[1], k)
    deleted = getattr(reader, "deleted", None)
    order = np.argsort(-bounds, kind="stable")
    heap: List[Tuple[float, int]] = []
    probed = 0
    for i in order:
        if not feasible[i]:
            continue
        if len(heap) == k and bounds[i] < heap[0][0]:
            break
        if probed == 8 and n_feasible > 64:
            thr = heap[0][0] if len(heap) == k else -np.inf
            alive = int((bounds[feasible] >= thr).sum())
            if alive > 0.25 * n_feasible:
                _set_path("exhaustive:cost-fallback")
                got = _phrase_scored(reader, phrase)
                if got is None:
                    return empty
                return _topk_from(got[0], got[1], k)
        probed += 1
        lo = int(starts[i])
        hi = int(edges[i + 1]) - 1
        sliced: Dict[str, tuple] = {}
        alive = True
        for t in pos_cache:
            docs_t, tfs_t, flat_t = pos_cache[t]
            i0 = int(np.searchsorted(docs_t, lo))
            i1 = int(np.searchsorted(docs_t, hi, side="right"))
            if i1 <= i0:
                alive = False
                break
            ps = pstarts[t]
            sliced[t] = (
                docs_t[i0:i1],
                tfs_t[i0:i1],
                flat_t[int(ps[i0]): int(ps[i1])],
            )
        if not alive:
            continue
        docs_u, pf = _sloppy_freqs(sliced, phrase)
        if deleted is not None and len(deleted) and len(docs_u):
            dpos = np.minimum(
                np.searchsorted(deleted, docs_u), len(deleted) - 1
            )
            keep = deleted[dpos] != docs_u
            docs_u, pf = docs_u[keep], pf[keep]
        if len(docs_u) == 0:
            continue
        norm_keys = _gather_norm_keys(reader, phrase.terms[0], docs_u)
        acc = scorer.score_array(pf, norm_keys).astype(dtype, copy=False)
        if len(heap) == k:
            mask = acc.astype(np.float64) >= heap[0][0]
            docs_u, acc = docs_u[mask], acc[mask]
        for d, sc in zip(docs_u, acc):
            entry = (float(sc), -int(d))
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return (
        np.array([-e[1] for e in out], dtype=np.int64),
        np.array([e[0] for e in out], dtype=dtype),
    )


def _multi_phrase_blockmax(reader, q: "MultiPhrase", k: int):
    """Pruned executor for MultiPhraseQuery: slot s's per-doc union
    occurrence count is at most the SUM of its present terms' tfs, and
    phrase freq is at most the MIN over slots of that sum — so intervals
    carry scorer(min over slots of Σ active block-max tfs, min active
    norm key) bounds with every-slot-active feasibility. Per-interval
    evaluation slices each slot's cached union key set and runs the
    same iterated intersection as :func:`_multi_phrase_scored`, keeping
    per-doc freqs — and the single score application with the
    declaration-order idf sum — bit-identical."""
    import math

    if not getattr(reader, "has_positions", False):
        raise ValueError(
            "multi-phrase queries need a positions-enabled index "
            "(IndexConfig.positions=True)"
        )
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype))
    if not q.term_arrays:
        return empty
    k1, b = getattr(reader, "bm25_params", (1.2, 0.75))
    pad = max(q.offsets) + 1
    idf64 = 0.0
    slot_keys: List[np.ndarray] = []
    slot_raws: List[List["_RawSynCursor"]] = []
    slot0_terms: List[str] = []
    for slot_terms, off in zip(q.term_arrays, q.offsets):
        present: List[str] = []
        parts = []
        raws = []
        for t in slot_terms:
            df, _ = reader.term_stats(t)
            if df == 0:
                continue  # absent terms contribute no stats
            idf64 += math.log(
                1.0 + (reader.doc_count - df + 0.5) / (df + 0.5)
            )
            present.append(t)
            base, max_pos = _packed_pos_keys(reader, t)
            if max_pos + pad >= (1 << _POS_SHIFT):
                raise ValueError(
                    "document too long for phrase key packing"
                )
            parts.append(base + np.int64(pad - off))
            raws.append(_raw_cursor(reader, t))
        if not present:
            return empty  # a slot with zero indexed terms cannot match
        keys = np.concatenate(parts)
        keys.sort()
        slot_keys.append(keys)
        slot_raws.append([r for r in raws if r.n_blocks > 0])
        if not slot_raws[-1]:
            return empty
        if not slot0_terms:
            slot0_terms = present
    scorer = make_scorer(
        reader.norm_kind, reader.doc_count, reader.sum_total_tf, 1,
        k1=k1, b=b,
    )
    if reader.norm_kind == "byte4":
        scorer.idf = np.float32(idf64)
        scorer.weight = np.float32(idf64)
    else:
        scorer.idf = idf64
        scorer.weight = idf64
    all_raws = [r for rs in slot_raws for r in rs]
    if sum(r.n_blocks for r in all_raws) <= 32:
        _set_path("exhaustive:small")
        got = _multi_phrase_scored(reader, q)
        if got is None:
            return empty
        return _topk_from(got[0], got[1], k)
    edges = np.unique(
        np.concatenate(
            [r.first_docs for r in all_raws]
            + [r.last_docs + 1 for r in all_raws]
        )
    )
    starts = edges[:-1]
    tf_bound = np.full(len(starts), np.iinfo(np.int64).max, dtype=np.int64)
    key_min = np.full(len(starts), np.iinfo(np.int64).max, dtype=np.int64)
    feasible = np.ones(len(starts), dtype=bool)
    for rs in slot_raws:
        slot_sum = np.zeros(len(starts), dtype=np.int64)
        slot_act = np.zeros(len(starts), dtype=bool)
        for r in rs:
            idx = np.searchsorted(r.last_docs, starts)
            idx_c = np.minimum(idx, r.n_blocks - 1)
            act = r.first_docs[idx_c] <= starts
            slot_sum += np.where(act, r.block_max_tf[idx_c], 0)
            key_min = np.where(
                act, np.minimum(key_min, r.block_min_key[idx_c]), key_min
            )
            slot_act |= act
        feasible &= slot_act
        tf_bound = np.minimum(tf_bound, slot_sum)
    n_feasible = int(feasible.sum())
    if n_feasible <= 32:
        # few intervals -> one vectorized global pass is cheaper
        _set_path("exhaustive:small")
        got = _multi_phrase_scored(reader, q)
        if got is None:
            return empty
        return _topk_from(got[0], got[1], k)
    bounds = np.zeros(len(starts), dtype=np.float64)
    if feasible.any():
        bounds[feasible] = scorer.bound_array(
            tf_bound[feasible], np.where(feasible, key_min, 0)[feasible]
        ).astype(np.float64)
    pad_f = (
        1.0 + 4 * 2.0 ** -23 if dtype == np.float32 else 1.0 + 2.0 ** -40
    )
    bounds = bounds * pad_f
    deleted = getattr(reader, "deleted", None)
    # per-term doc sets of slot 0 for the norm-key gather (whichever
    # slot-0 term the doc carries, declaration order — mirrors the
    # exhaustive tail)
    slot0_docs = {t: reader.term_positions(t)[0] for t in slot0_terms}
    order = np.argsort(-bounds, kind="stable")
    heap: List[Tuple[float, int]] = []
    probed = 0
    for i in order:
        if not feasible[i]:
            continue
        if len(heap) == k and bounds[i] < heap[0][0]:
            break
        if probed == 8 and n_feasible > 64:
            thr = heap[0][0] if len(heap) == k else -np.inf
            alive = int((bounds[feasible] >= thr).sum())
            if alive > 0.25 * n_feasible:
                _set_path("exhaustive:cost-fallback")
                got = _multi_phrase_scored(reader, q)
                if got is None:
                    return empty
                return _topk_from(got[0], got[1], k)
        probed += 1
        lo = int(starts[i])
        hi = int(edges[i + 1]) - 1
        inter = None
        for keys in slot_keys:
            s0 = int(np.searchsorted(keys, lo << _POS_SHIFT))
            s1 = int(np.searchsorted(keys, (hi + 2) << _POS_SHIFT))
            sl = keys[s0:s1]
            # tighten to the exact doc range (shifts keep keys within
            # (doc << S, (doc+2) << S); re-slice on doc tags)
            if len(sl):
                tags = sl >> np.int64(_POS_SHIFT)
                m = (tags >= lo) & (tags <= hi)
                sl = sl[m]
            if inter is None:
                inter = sl
            else:
                if len(inter) == 0 or len(sl) == 0:
                    inter = inter[:0]
                    break
                pos = np.minimum(np.searchsorted(sl, inter), len(sl) - 1)
                inter = inter[sl[pos] == inter]
        if inter is None or len(inter) == 0:
            continue
        occ_docs = inter >> np.int64(_POS_SHIFT)
        docs_u, pf = np.unique(occ_docs, return_counts=True)
        if deleted is not None and len(deleted) and len(docs_u):
            dpos = np.minimum(
                np.searchsorted(deleted, docs_u), len(deleted) - 1
            )
            keep = deleted[dpos] != docs_u
            docs_u, pf = docs_u[keep], pf[keep]
        if len(docs_u) == 0:
            continue
        keys_u = np.zeros(len(docs_u), dtype=np.int64)
        have = np.zeros(len(docs_u), dtype=bool)
        for t in slot0_terms:
            docs_t = slot0_docs[t]
            if len(docs_t) == 0:
                continue
            pos = np.minimum(
                np.searchsorted(docs_t, docs_u), len(docs_t) - 1
            )
            hit = (docs_t[pos] == docs_u) & ~have
            if hit.any():
                keys_u[hit] = _gather_norm_keys(reader, t, docs_u[hit])
                have[hit] = True
        acc = scorer.score_array(pf, keys_u).astype(dtype, copy=False)
        if len(heap) == k:
            mask = acc.astype(np.float64) >= heap[0][0]
            docs_u, acc = docs_u[mask], acc[mask]
        for d, s in zip(docs_u, acc):
            entry = (float(s), -int(d))
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return (
        np.array([-e[1] for e in out], dtype=np.int64),
        np.array([e[0] for e in out], dtype=dtype),
    )


def _raw_cursor(reader, term: str) -> "_RawSynCursor":
    """Per-reader LRU cache of raw block cursors: the per-block max-tf /
    min-key extraction walks every block in Python, which must not be
    paid per query on a warm searcher."""
    cache = reader.__dict__.setdefault("_raw_cursors", LruDict(256))
    c = cache.get(term)
    if c is None:
        c = _RawSynCursor(reader.postings(term))
        cache[term] = c
    return c


def _synonym_blockmax(reader, query, k: int):
    """Pruned executor for SynonymQuery (reference analogue: the blended
    pseudo-term participates in WAND like any term — SynonymQuery.java
    builds one SynonymScorer over the union with impact-merged bounds,
    SynonymQuery.java:360-420 ImpactsMergingUtils). Interval bound =
    scorer(sum of active members' block-max tfs, min active block key):
    valid because the blended score is monotone in the summed tf and
    antitone in the decoded length. Per-interval evaluation mirrors
    _synonym_scored (per-doc integer tf sum, ONE score application), so
    results are bit-identical regardless of interval partitioning."""
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype))
    df_blend, ttf_blend = 0, 0
    present: List[str] = []
    for t in sorted(set(query.terms)):
        df, ttf = reader.term_stats(t)
        if df > 0:
            df_blend = max(df_blend, df)
            ttf_blend += ttf
            present.append(t)
    if df_blend == 0:
        return empty
    scorer = _term_scorer(reader, df_blend, ttf_blend)
    members = [_raw_cursor(reader, t) for t in present]
    members = [m for m in members if m.n_blocks > 0]
    if not members:
        return empty
    if sum(m.n_blocks for m in members) <= 32:
        _set_path("exhaustive:small")
        got = _synonym_scored(reader, query)
        if got is None:
            return empty
        return _topk_from(got[0], got[1], k)
    edges = np.unique(
        np.concatenate(
            [m.first_docs for m in members]
            + [m.last_docs + 1 for m in members]
        )
    )
    starts = edges[:-1]
    tf_bound = np.zeros(len(starts), dtype=np.int64)
    key_min = np.full(len(starts), np.iinfo(np.int64).max, dtype=np.int64)
    active_any = np.zeros(len(starts), dtype=bool)
    for m in members:
        idx = np.searchsorted(m.last_docs, starts)
        idx_c = np.minimum(idx, m.n_blocks - 1)
        act = m.first_docs[idx_c] <= starts
        tf_bound += np.where(act, m.block_max_tf[idx_c], 0)
        key_min = np.where(
            act, np.minimum(key_min, m.block_min_key[idx_c]), key_min
        )
        active_any |= act
    feasible = active_any
    n_feasible = int(feasible.sum())
    if n_feasible <= 32:
        # few intervals -> one vectorized global union is cheaper
        _set_path("exhaustive:small")
        got = _synonym_scored(reader, query)
        if got is None:
            return empty
        return _topk_from(got[0], got[1], k)
    safe_keys = np.where(feasible, key_min, 0)
    bounds = np.zeros(len(starts), dtype=np.float64)
    if feasible.any():
        bounds[feasible] = scorer.bound_array(
            tf_bound[feasible], safe_keys[feasible]
        ).astype(np.float64)
    pad = (
        1.0 + 4 * 2.0 ** -23 if dtype == np.float32 else 1.0 + 2.0 ** -40
    )
    bounds = bounds * pad
    deleted = getattr(reader, "deleted", None)
    order = np.argsort(-bounds, kind="stable")
    heap: List[Tuple[float, int]] = []
    probed = 0
    for i in order:
        if not feasible[i]:
            continue
        if len(heap) == k and bounds[i] < heap[0][0]:
            break
        if probed == 8 and n_feasible > 64:
            thr = heap[0][0] if len(heap) == k else -np.inf
            alive = int((bounds[feasible] >= thr).sum())
            if alive > 0.25 * n_feasible:
                _set_path("exhaustive:cost-fallback")
                got = _synonym_scored(reader, query)
                if got is None:
                    return empty
                return _topk_from(got[0], got[1], k)
        probed += 1
        lo = int(starts[i])
        hi = int(edges[i + 1]) - 1
        parts = [m.raw_in(lo, hi) for m in members]
        docs = np.concatenate([p[0] for p in parts])
        if len(docs) == 0:
            continue
        tfs = np.concatenate([p[1] for p in parts])
        keys = np.concatenate([p[2] for p in parts])
        so = np.argsort(docs, kind="stable")
        docs, tfs, keys = docs[so], tfs[so], keys[so]
        uniq, ustarts = np.unique(docs, return_index=True)
        sum_tf = np.add.reduceat(tfs.astype(np.int64), ustarts)
        key_u = keys[ustarts]
        if deleted is not None and len(deleted) and len(uniq):
            pos = np.minimum(
                np.searchsorted(deleted, uniq), len(deleted) - 1
            )
            keep = deleted[pos] != uniq
            uniq, sum_tf, key_u = uniq[keep], sum_tf[keep], key_u[keep]
        if len(uniq) == 0:
            continue
        acc = scorer.score_array(sum_tf, key_u).astype(dtype, copy=False)
        if len(heap) == k:
            mask = acc.astype(np.float64) >= heap[0][0]
            uniq, acc = uniq[mask], acc[mask]
        for d, s in zip(uniq, acc):
            entry = (float(s), -int(d))
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return (
        np.array([-e[1] for e in out], dtype=np.int64),
        np.array([e[0] for e in out], dtype=dtype),
    )


def _combine_groups(cursors, is_must, n_must, msm, groups, allc, not_docs,
                    dtype, lo, hi):
    """Per-interval candidate+score combine for required-OR groups — the
    doc-sliced image of :func:`_group_candidates`: candidates = MUST
    intersection ∩ each group's union [∩ msm-SHOULD], MUST_NOT excluded;
    scores accumulate over every scoring cursor (base + group members) in
    the SAME sorted-term order, so per-doc float sums are bit-identical
    to the exhaustive path."""
    per_term = [c.docs_in(lo, hi) for c in cursors]
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype))
    cand = None
    if n_must:
        for (docs, _), m in zip(per_term, is_must):
            if not m:
                continue
            cand = docs if cand is None else np.intersect1d(
                cand, docs, assume_unique=True
            )
            if len(cand) == 0:
                return empty
    if msm > 0:
        should_docs = [d for (d, _), m in zip(per_term, is_must) if not m]
        if should_docs:
            u, c = np.unique(np.concatenate(should_docs), return_counts=True)
            ok = u[c >= msm]
        else:
            ok = np.empty(0, dtype=np.int64)
        cand = ok if cand is None else cand[
            np.isin(cand, ok, assume_unique=True)
        ]
    for g in groups:
        gdocs = np.unique(
            np.concatenate([c.docs_in(lo, hi)[0] for c in g])
        )
        if len(gdocs) == 0:
            return empty
        cand = gdocs if cand is None else np.intersect1d(
            cand, gdocs, assume_unique=True
        )
        if len(cand) == 0:
            return empty
    if not_docs is not None and len(not_docs) and len(cand):
        pos = np.minimum(np.searchsorted(not_docs, cand), len(not_docs) - 1)
        cand = cand[not_docs[pos] != cand]
    cand = np.asarray(cand, dtype=np.int64)
    acc = np.zeros(len(cand), dtype=dtype)
    if len(cand):
        for c in allc:
            docs, scores = c.docs_in(lo, hi)
            if len(docs) == 0:
                continue
            pos = np.minimum(np.searchsorted(docs, cand), len(docs) - 1)
            hit = docs[pos] == cand
            if hit.any():
                acc[hit] += scores[pos[hit]].astype(dtype)
    return cand, acc


def _set_path(path: str) -> None:
    """Record which engine the last score_blockmax call selected (test /
    bench observability for 'is pruning actually engaged?'; per-process,
    like any module global — read it in the same process that searched)."""
    score_blockmax.last_path = path


# ---------------------------------------------------------------------------
# Pruned executor for the RECURSIVE combiners (MixedQuery / NestedQuery) —
# the reference analogue is the Impacts API propagating max-score-per-block
# bounds through the scorer tree (search/WANDScorer.java consuming any
# child's getMaxScore/advanceShallow; PhraseWeight exposes ImpactsSource),
# so nested booleans prune exactly like flat ones.  Each clause kind wraps
# in an adapter exposing (a) its block edge arrays, (b) per-interval
# (feasible, upper-bound) vectors, (c) exact doc-range evaluation that is
# bit-identical to the global exhaustive result restricted to the range.
# The tree clause composes child adapters under _combine_clauses — the
# SAME combination helper the exhaustive path uses, so per-doc float
# accumulation (base -> must children -> should children) is preserved.
# ---------------------------------------------------------------------------


class _FlatClause:
    """A flat BooleanQuery as a pruned-tree clause (the same cursors,
    bounds, feasibility and combine the flat score_blockmax body uses)."""

    def __init__(self, reader, query):
        self.reader = reader
        self.dtype = (
            np.float32 if reader.norm_kind == "byte4" else np.float64
        )
        self.impossible = False
        self.unsupported = False
        self.msm = (
            query.minimum_should_match
            if isinstance(query, BooleanQuery) else 0
        )
        prep = _prepare(reader, query)
        if prep is None:
            self.impossible = True
            self.all_scoring = []
            return
        cursors, is_must, not_cursors, _dtype, groups = prep
        filters = getattr(query, "filters", ())
        self.fdocs = None
        if filters:
            if len(cursors) == 0 and not groups:
                # pure-filter clause: match-all-passing-docs at score 0 —
                # the exhaustive path owns those semantics
                self.unsupported = True
                self.all_scoring = []
                return
            self.fdocs = reader.filter_docs(filters)
            if self.fdocs is None or len(self.fdocs) == 0:
                self.impossible = True
                self.all_scoring = []
                return
        if any(c.n_blocks == 0 and m for c, m in zip(cursors, is_must)):
            self.impossible = True
            self.all_scoring = []
            return
        keep = [i for i, c in enumerate(cursors) if c.n_blocks > 0]
        cursors = [cursors[i] for i in keep]
        is_must = is_must[keep] if len(keep) else np.zeros(0, dtype=bool)
        kept_groups: List[List[TermCursor]] = []
        for g in groups:
            gk = [c for c in g if c.n_blocks > 0]
            if not gk:
                self.impossible = True
                self.all_scoring = []
                return
            kept_groups.append(gk)
        groups = kept_groups
        if len(cursors) == 0 and not groups:
            self.impossible = True
            self.all_scoring = []
            return
        self.cursors = cursors
        self.is_must = is_must
        self.n_must = int(is_must.sum())
        self.groups = groups
        self.not_docs = (
            _NotCursorView.all_docs(not_cursors) if not_cursors else None
        )
        self.all_scoring = list(cursors) + [c for g in groups for c in g]
        self.allc_sorted = (
            sorted(self.all_scoring, key=lambda c: c.term)
            if groups else None
        )

    def edge_arrays(self):
        return [c.first_docs for c in self.all_scoring] + [
            c.last_docs + 1 for c in self.all_scoring
        ]

    def active_and_bounds(self, starts):
        bounds = np.zeros(len(starts), dtype=np.float64)
        active_cnt_should = np.zeros(len(starts), dtype=np.int32)
        active_all_must = np.ones(len(starts), dtype=bool)
        for c, m in zip(self.cursors, self.is_must):
            idx = np.searchsorted(c.last_docs, starts)
            idx_c = np.minimum(idx, c.n_blocks - 1)
            act = c.first_docs[idx_c] <= starts
            bounds += np.where(act, c.block_max[idx_c], 0.0)
            if m:
                active_all_must &= act
            else:
                active_cnt_should += act.astype(np.int32)
        group_act: List[np.ndarray] = []
        for g in self.groups:
            act_g = np.zeros(len(starts), dtype=bool)
            for c in g:
                idx = np.searchsorted(c.last_docs, starts)
                idx_c = np.minimum(idx, c.n_blocks - 1)
                act = c.first_docs[idx_c] <= starts
                bounds += np.where(act, c.block_max[idx_c], 0.0)
                act_g |= act
            group_act.append(act_g)
        if self.groups:
            feasible = np.ones(len(starts), dtype=bool)
            if self.n_must:
                feasible &= active_all_must
            if self.msm > 0:
                feasible &= active_cnt_should >= self.msm
            for act_g in group_act:
                feasible &= act_g
        elif self.n_must:
            feasible = active_all_must
            if self.msm > 0:
                feasible = feasible & (active_cnt_should >= self.msm)
        else:
            feasible = active_cnt_should >= max(1, self.msm)
        if self.fdocs is not None:
            # crude doc-range presence: any filter doc inside the span
            # covered from each start to the next edge is unknown here
            # (starts only); activity stays conservative without it —
            # the eval-range intersection enforces exactness
            pass
        return feasible, bounds

    def n_scoring(self):
        return len(self.all_scoring)

    def eval_range(self, lo, hi):
        if self.groups:
            cand, acc = _combine_groups(
                self.cursors, self.is_must, self.n_must, self.msm,
                self.groups, self.allc_sorted, self.not_docs, self.dtype,
                lo, hi,
            )
        else:
            per_term = [c.docs_in(lo, hi) for c in self.cursors]
            cand, acc = _combine(
                per_term, self.is_must, self.n_must, self.msm,
                self.not_docs, self.dtype,
            )
        if self.fdocs is not None and len(cand):
            pos = np.minimum(
                np.searchsorted(self.fdocs, cand), len(self.fdocs) - 1
            )
            fkeep = self.fdocs[pos] == cand
            cand, acc = cand[fkeep], acc[fkeep]
        return cand, acc


class _PhraseClause:
    """An EXACT phrase (slop=0) as a pruned-tree clause — the
    _phrase_blockmax bound (min member block-max tf + min norm key) and
    its doc-range-sliced key-intersection evaluation."""

    def __init__(self, reader, phrase):
        import math

        self.reader = reader
        self.phrase = phrase
        self.dtype = (
            np.float32 if reader.norm_kind == "byte4" else np.float64
        )
        self.impossible = False
        self.unsupported = False
        k1, b = getattr(reader, "bm25_params", (1.2, 0.75))
        pad = max(phrase.offsets) + 1
        idf64 = 0.0
        self.raws = []
        self.shifted = []
        for t, off in zip(phrase.terms, phrase.offsets):
            df, _ = reader.term_stats(t)
            if df == 0:
                self.impossible = True
                return
            idf64 += math.log(
                1.0 + (reader.doc_count - df + 0.5) / (df + 0.5)
            )
            base, max_pos = _packed_pos_keys(reader, t)
            if max_pos + pad >= (1 << _POS_SHIFT):
                self.unsupported = True
                return
            self.shifted.append(
                (base + np.int64(pad - off), np.int64(pad - off))
            )
            self.raws.append(_raw_cursor(reader, t))
        if any(r.n_blocks == 0 for r in self.raws):
            self.impossible = True
            return
        scorer = make_scorer(
            reader.norm_kind, reader.doc_count, reader.sum_total_tf, 1,
            k1=k1, b=b,
        )
        if reader.norm_kind == "byte4":
            scorer.idf = np.float32(idf64)
            scorer.weight = np.float32(idf64)
        else:
            scorer.idf = idf64
            scorer.weight = idf64
        self.scorer = scorer

    def edge_arrays(self):
        return [r.first_docs for r in self.raws] + [
            r.last_docs + 1 for r in self.raws
        ]

    def active_and_bounds(self, starts):
        tf_bound = np.full(
            len(starts), np.iinfo(np.int64).max, dtype=np.int64
        )
        key_min = np.full(
            len(starts), np.iinfo(np.int64).max, dtype=np.int64
        )
        feasible = np.ones(len(starts), dtype=bool)
        for r in self.raws:
            idx = np.searchsorted(r.last_docs, starts)
            idx_c = np.minimum(idx, r.n_blocks - 1)
            act = r.first_docs[idx_c] <= starts
            feasible &= act
            tf_bound = np.where(
                act, np.minimum(tf_bound, r.block_max_tf[idx_c]), tf_bound
            )
            key_min = np.where(
                act, np.minimum(key_min, r.block_min_key[idx_c]), key_min
            )
        bounds = np.zeros(len(starts), dtype=np.float64)
        if feasible.any():
            bounds[feasible] = self.scorer.bound_array(
                tf_bound[feasible],
                np.where(feasible, key_min, 0)[feasible],
            ).astype(np.float64)
        return feasible, bounds

    def n_scoring(self):
        return len(self.raws)

    def eval_range(self, lo, hi):
        empty = (np.empty(0, np.int64), np.empty(0, dtype=self.dtype))
        inter = None
        for keys, c in self.shifted:
            s0 = int(np.searchsorted(keys, (lo << _POS_SHIFT) + int(c)))
            s1 = int(
                np.searchsorted(keys, ((hi + 1) << _POS_SHIFT) + int(c))
            )
            sl = keys[s0:s1]
            if inter is None:
                inter = sl
            else:
                if len(inter) == 0 or len(sl) == 0:
                    return empty
                pos = np.minimum(np.searchsorted(sl, inter), len(sl) - 1)
                inter = inter[sl[pos] == inter]
        if inter is None or len(inter) == 0:
            return empty
        occ_docs = inter >> np.int64(_POS_SHIFT)
        docs_u, pf = np.unique(occ_docs, return_counts=True)
        deleted = getattr(self.reader, "deleted", None)
        if deleted is not None and len(deleted) and len(docs_u):
            dpos = np.minimum(
                np.searchsorted(deleted, docs_u), len(deleted) - 1
            )
            keep = deleted[dpos] != docs_u
            docs_u, pf = docs_u[keep], pf[keep]
        if len(docs_u) == 0:
            return empty
        norm_keys = _gather_norm_keys(
            self.reader, self.phrase.terms[0], docs_u
        )
        acc = self.scorer.score_array(pf, norm_keys).astype(
            self.dtype, copy=False
        )
        return docs_u, acc


class _TreeClause:
    """A MixedQuery / NestedQuery node as a pruned-tree clause: child
    adapters combined under the exhaustive path's own _combine_clauses,
    with bounds = feasibility-gated sum of constituent bounds."""

    def __init__(self, reader, base_raw, children):
        self.reader = reader
        self.dtype = (
            np.float32 if reader.norm_kind == "byte4" else np.float64
        )
        self.impossible = False
        self.unsupported = False
        self.scoring_children = []  # [(role, adapter)] in clause order
        self.not_sets = []
        roles = [r for r, _c in children]
        for role, child in children:
            if role == "must_not":
                got = _exhaustive_candidates(reader, child)
                if got is not None and len(got[0]):
                    self.not_sets.append(np.asarray(got[0], np.int64))
                continue
            ad = _tree_clause_adapter(reader, child)
            if ad is None or ad.unsupported:
                self.unsupported = True
                return
            if ad.impossible and role == "must":
                self.impossible = True
                return
            self.scoring_children.append((role, ad))
        # base decomposition mirrors _clauses_candidates exactly
        not_terms = tuple(sorted(set(base_raw.must_not)))
        not_multi = tuple(
            (kk, p, a, "should") for (kk, p, a, ro) in base_raw.multi
            if ro == "must_not"
        )
        base = BooleanQuery(
            must=base_raw.must, should=base_raw.should, must_not=(),
            minimum_should_match=0,
            multi=tuple(m for m in base_raw.multi if m[3] != "must_not"),
            boosts=base_raw.boosts, filters=base_raw.filters,
            must_groups=base_raw.must_groups,
        )
        if not_terms or not_multi:
            ex = _exhaustive_candidates(
                reader, BooleanQuery(should=not_terms, multi=not_multi)
            )
            if ex is not None and len(ex[0]):
                self.not_sets.append(np.asarray(ex[0], np.int64))
        has_base = bool(
            base.must or base.should or base.multi or base.filters
            or base.must_groups
        )
        any_must_clause = "must" in roles
        any_should_clause = "should" in roles
        self.base_required = bool(
            base.must or base.filters or base.multi or base.must_groups
        ) or (
            bool(base.should)
            and not any_must_clause and not any_should_clause
        )
        self.base = None
        if has_base:
            ad = _FlatClause(reader, base)
            if ad.unsupported:
                self.unsupported = True
                return
            if ad.impossible:
                if self.base_required:
                    self.impossible = True
                    return
            else:
                self.base = ad
        if self.base is None and not self.scoring_children:
            self.impossible = True
            return
        self.has_required = (
            any(r == "must" for r, _a in self.scoring_children)
            or (self.base_required and self.base is not None)
        )

    def edge_arrays(self):
        out = []
        for _r, ad in self.scoring_children:
            if not ad.impossible:
                out.extend(ad.edge_arrays())
        if self.base is not None:
            out.extend(self.base.edge_arrays())
        return out

    def active_and_bounds(self, starts):
        feas = np.ones(len(starts), dtype=bool)
        bounds = np.zeros(len(starts), dtype=np.float64)
        any_should = np.zeros(len(starts), dtype=bool)
        for role, ad in self.scoring_children:
            if ad.impossible:
                continue  # role is should here (must handled at init)
            a, b = ad.active_and_bounds(starts)
            bounds += np.where(a, b, 0.0)
            if role == "must":
                feas &= a
            else:
                any_should |= a
        if self.base is not None:
            a, b = self.base.active_and_bounds(starts)
            bounds += np.where(a, b, 0.0)
            if self.base_required:
                feas &= a
            else:
                any_should |= a
        if not self.has_required:
            feas &= any_should
        return feas, bounds

    def n_scoring(self):
        n = sum(
            ad.n_scoring() for _r, ad in self.scoring_children
            if not ad.impossible
        )
        if self.base is not None:
            n += self.base.n_scoring()
        return n

    def eval_range(self, lo, hi):
        empty = (np.empty(0, np.int64), np.empty(0, dtype=self.dtype))
        if self.impossible:
            return empty
        must_p, should_p = [], []
        for role, ad in self.scoring_children:
            got = (
                ad.eval_range(lo, hi) if not ad.impossible
                else empty
            )
            (must_p if role == "must" else should_p).append(got)
        base_scored = None
        if self.base is not None:
            bs = self.base.eval_range(lo, hi)
            if len(bs[0]):
                base_scored = bs
        return _combine_clauses(
            base_scored, self.base_required, must_p, should_p,
            self.not_sets, self.dtype,
        )


def _tree_clause_adapter(reader, q):
    """Adapter for one clause of the pruned tree executor, or None when
    the clause kind has no interval bound (sloppy phrases, MultiPhrase
    children, pure-filter booleans) — the whole tree then routes to the
    exhaustive combiner."""
    if isinstance(q, PhraseQuery):
        if getattr(q, "slop", 0) > 0 or not getattr(
            reader, "has_positions", False
        ):
            return None
        return _PhraseClause(reader, q)
    if isinstance(q, MixedQuery):
        return _TreeClause(
            reader, q.base, [(role, ph) for ph, role in q.phrases]
        )
    if isinstance(q, NestedQuery):
        return _TreeClause(reader, q.base, list(q.children))
    if isinstance(q, (TermQuery, BooleanQuery)):
        if isinstance(q, TermQuery):
            q = BooleanQuery(should=(q.term,))
        return _FlatClause(reader, q)
    return None


def _tree_blockmax(reader, query, k: int):
    """Pruned executor for MixedQuery / NestedQuery: the standard
    interval frame (edges from every constituent's blocks, descending
    bound order, two-level small-scale guards, probe-based cost
    fallback) over the recursive clause adapters.  Bit-identical to
    score_exhaustive because every range evaluation runs the SAME
    per-doc combination (_combine_clauses) on range-sliced inputs."""
    ad = _tree_clause_adapter(reader, query)
    if ad is None or ad.unsupported:
        _set_path("exhaustive:query-kind")
        return score_exhaustive(reader, query, k)
    dtype = ad.dtype
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype))
    if ad.impossible:
        _set_path("empty")
        return empty
    edge_arrays = ad.edge_arrays()
    if not edge_arrays:
        _set_path("empty")
        return empty
    total_blocks = sum(len(a) for a in edge_arrays) // 2
    if total_blocks <= 32:
        _set_path("exhaustive:small")
        return score_exhaustive(reader, query, k)
    edges = np.unique(np.concatenate(edge_arrays))
    if len(edges) < 2:
        _set_path("empty")
        return empty
    starts = edges[:-1]
    feasible, bounds = ad.active_and_bounds(starts)
    n_feasible = int(feasible.sum())
    if n_feasible <= 32:
        _set_path("exhaustive:small")
        return score_exhaustive(reader, query, k)
    n_scoring = ad.n_scoring()
    pad = (
        1.0 + (n_scoring + 2) * 2.0 ** -23
        if dtype == np.float32
        else 1.0 + 2.0 ** -40
    )
    bounds = bounds * pad
    _set_path("pruned:tree")
    order = np.argsort(-bounds, kind="stable")
    heap: List[Tuple[float, int]] = []
    probe_budget = 8
    probed = 0
    for i in order:
        if not feasible[i]:
            continue
        if len(heap) == k and bounds[i] < heap[0][0]:
            break
        if probed == probe_budget and n_feasible > 64:
            thr = heap[0][0] if len(heap) == k else -np.inf
            alive = int((bounds[feasible] >= thr).sum())
            if alive > 0.25 * n_feasible:
                _set_path("exhaustive:cost-fallback")
                return score_exhaustive(reader, query, k)
        probed += 1
        lo = int(starts[i])
        hi = int(edges[i + 1]) - 1
        cand, acc = ad.eval_range(lo, hi)
        if len(cand) == 0:
            continue
        if len(heap) == k:
            mask = acc.astype(np.float64) >= heap[0][0]
            cand, acc = cand[mask], acc[mask]
        for d, s in zip(cand, acc):
            entry = (float(s), -int(d))
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return (
        np.array([-e[1] for e in out], dtype=np.int64),
        np.array([e[0] for e in out], dtype=dtype),
    )


def score_blockmax(reader, query, k: int = 10):
    """Block-max pruned executor; result-identical to score_exhaustive.

    Since r4 the pruned path also covers non-BM25 similarities and
    FILTER-carrying boolean queries (the reference computes impact score
    bounds for ANY SimScorer — search/MaxScoreCache.java:63-80 — and
    intersects filter clauses in the block-max conjunction,
    search/BooleanScorerSupplier.java:398-418): every similarity in
    functions/similarities.py is monotone non-decreasing in tf and
    non-increasing in decoded doc length, so the max of score_array over
    the stored (tf, key) Pareto frontier IS the exact per-block upper
    bound; clamped-at-zero models (LMDirichlet, DFI, AxiomaticF2EXP)
    yield bound-0 blocks whose docs still MATCH at score 0, so interval
    feasibility keys on cursor activity, not on bound > 0. FILTER
    clauses become a doc-wise conjunction: an interval without any
    filter-passing doc is infeasible, and surviving candidates are
    intersected with the filter set before entering the heap.
    Required-OR groups (MUST multi-term clauses) also prune: a group's
    bound contribution is the sum of its active members' block maxes
    (every matching member scores), feasibility requires >= 1 active
    member per group, and the per-interval combine is the doc-sliced
    image of :func:`_group_candidates` (same sorted-term accumulation
    order, so float sums stay bit-identical)."""
    if k <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    sim_sel = getattr(reader, "similarity", None)
    if sim_sel is not None:
        from .similarities import NEGATIVE_SCORE_MODELS

        if sim_sel[0] in NEGATIVE_SCORE_MODELS:
            # negative (log-probability) scores break the additive
            # block-max bound: a doc MISSING a SHOULD clause out-scores
            # one containing it, which interval bound summation cannot
            # model — same reason the reference's impacts/WAND contract
            # requires non-negative scores. Exhaustive is exact.
            _set_path("exhaustive:negative-scores")
            return score_exhaustive(reader, query, k)
    if isinstance(query, SynonymQuery):
        # blended pseudo-term: its own pruned executor (r4) — interval
        # bound from summed block-max tfs + min norm key
        _set_path("pruned:synonym")
        return _synonym_blockmax(reader, query, k)
    if (
        isinstance(query, PhraseQuery)
        and getattr(query, "slop", 0) == 0
        and getattr(reader, "has_positions", False)
    ):
        # exact phrases prune via the min-member-tf impact bound (r4);
        # sloppy phrases keep the exhaustive anchor sweep
        _set_path("pruned:phrase")
        return _phrase_blockmax(reader, query, k)
    if isinstance(query, MultiPhrase) and getattr(
        reader, "has_positions", False
    ):
        # slot unions prune via the min-over-slots sum-tf impact bound
        _set_path("pruned:multiphrase")
        return _multi_phrase_blockmax(reader, query, k)
    if isinstance(query, MatchAllQuery):
        # constant-score universe: top-k under (score desc, doc asc) is
        # simply the first k LIVE doc ids — no whole-corpus scoring
        # (reference: MatchAllDocsQuery's constant bulk scorer)
        _set_path("pruned:matchall")
        dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
        docs = np.asarray(reader.all_doc_ids(), dtype=np.int64)
        deleted = getattr(reader, "deleted", None)
        if deleted is not None and len(deleted) and len(docs):
            # walk forward in slices until k live docs are found
            out = []
            need = k
            lo = 0
            step = max(k * 4, 1024)
            while need > 0 and lo < len(docs):
                sl = docs[lo:lo + step]
                pos = np.minimum(
                    np.searchsorted(deleted, sl), len(deleted) - 1
                )
                live = sl[deleted[pos] != sl]
                out.append(live[:need])
                need -= len(live[:need])
                lo += step
            docs = (
                np.concatenate(out) if out else np.empty(0, np.int64)
            )
        else:
            docs = docs[:k]
        return docs, np.ones(len(docs), dtype=dtype)
    if isinstance(query, (MixedQuery, NestedQuery)):
        # recursive combiners prune through the clause-adapter tree
        # (r4 late addition); sloppy-phrase children route it back to
        # the exhaustive combiner inside _tree_blockmax
        return _tree_blockmax(reader, query, k)
    if (
        isinstance(query, PhraseQuery)
        and getattr(query, "slop", 0) > 0
        and getattr(reader, "has_positions", False)
    ):
        # sloppy phrases prune via the anchor-term tf bound (each match
        # weighs <= 1 and is anchored at one first-term position)
        _set_path("pruned:sloppy")
        return _sloppy_blockmax(reader, query, k)
    if isinstance(query, (PhraseQuery, MultiPhrase)):
        # positions-disabled indexes can't run positional verification
        _set_path("exhaustive:query-kind")
        return score_exhaustive(reader, query, k)
    prep = _prepare(reader, query)
    if prep is None:
        _set_path("empty")
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    filters = getattr(query, "filters", ())
    fdocs = None
    if filters:
        if len(prep[0]) == 0:
            # pure-filter query (no scoring terms): exhaustive owns the
            # match-all-passing-docs semantics
            _set_path("exhaustive:pure-filter")
            return score_exhaustive(reader, query, k, _prep=prep)
        fdocs = reader.filter_docs(filters)
        if fdocs is None or len(fdocs) == 0:
            _set_path("empty")
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=prep[3])
    single = _single_term_shortcut(prep, query, k)
    if single is not None and single.n_blocks > 0:
        _set_path("champion")
        return _champion_topk(reader, single, k)
    cursors, is_must, not_cursors, dtype, groups = prep
    # a cursor can be block-less locally even with global df > 0 (sharded
    # search under global stats): an empty MUST list empties the result;
    # empty SHOULD lists just drop out; a required-OR group with no local
    # blocks empties the result (its union is empty)
    if any(c.n_blocks == 0 and m for c, m in zip(cursors, is_must)):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype)
    keep = [i for i, c in enumerate(cursors) if c.n_blocks > 0]
    cursors = [cursors[i] for i in keep]
    is_must = is_must[keep] if len(keep) else np.zeros(0, dtype=bool)
    kept_groups: List[List[TermCursor]] = []
    for g in groups:
        gk = [c for c in g if c.n_blocks > 0]
        if not gk:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype)
        kept_groups.append(gk)
    groups = kept_groups
    n = len(cursors)
    if n == 0 and not groups:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    msm = query.minimum_should_match if isinstance(query, BooleanQuery) else 0
    n_must = int(is_must.sum())

    # elementary intervals on block boundaries (group members included)
    all_scoring = list(cursors) + [c for g in groups for c in g]
    edges = np.unique(
        np.concatenate(
            [c.first_docs for c in all_scoring]
            + [c.last_docs + 1 for c in all_scoring]
        )
    )
    if len(edges) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    starts = edges[:-1]
    # active block of term t in interval i: block b with first<=start<=last
    bounds = np.zeros(len(starts), dtype=np.float64)
    active_cnt_should = np.zeros(len(starts), dtype=np.int32)
    active_all_must = np.ones(len(starts), dtype=bool)
    for c, m in zip(cursors, is_must):
        idx = np.searchsorted(c.last_docs, starts)  # candidate block
        idx_c = np.minimum(idx, c.n_blocks - 1)
        act = c.first_docs[idx_c] <= starts
        bounds += np.where(act, c.block_max[idx_c], 0.0)
        if m:
            active_all_must &= act
        else:
            active_cnt_should += act.astype(np.int32)
    # required-OR groups: every member that matches SCORES, so the bound
    # sums active members' block maxes; an interval is feasible only when
    # each group has >= 1 active member (groups are conjunctive)
    group_act: List[np.ndarray] = []
    for g in groups:
        act_g = np.zeros(len(starts), dtype=bool)
        for c in g:
            idx = np.searchsorted(c.last_docs, starts)
            idx_c = np.minimum(idx, c.n_blocks - 1)
            act = c.first_docs[idx_c] <= starts
            bounds += np.where(act, c.block_max[idx_c], 0.0)
            act_g |= act
        group_act.append(act_g)
    # feasibility masks — activity-based, NOT ``bounds > 0``: clamped
    # similarities (LMDirichlet / DFI / AxiomaticF2EXP) legitimately
    # produce bound-0 blocks whose docs still MATCH at score 0 and can
    # enter an under-filled top-k (doc-id tie order)
    if groups:
        # with a required group present, plain SHOULD terms are purely
        # optional (the _group_candidates semantics)
        feasible = np.ones(len(starts), dtype=bool)
        if n_must:
            feasible &= active_all_must
        if msm > 0:
            feasible &= active_cnt_should >= msm
        for act_g in group_act:
            feasible &= act_g
    elif n_must:
        feasible = active_all_must.copy()
        if msm > 0:
            feasible &= active_cnt_should >= msm
    else:
        feasible = active_cnt_should >= max(1, msm)
    if fdocs is not None:
        # FILTER conjunction at interval granularity (reference analogue:
        # filter clauses participate in the block-max conjunction,
        # BooleanScorerSupplier.java:398-418): an interval containing no
        # filter-passing doc is infeasible
        feasible &= (
            np.searchsorted(fdocs, edges[1:]) > np.searchsorted(fdocs, starts)
        )
    # conservative pad for float32 accumulation wobble (round-up analogue)
    n_scoring = len(all_scoring)
    pad = (
        1.0 + (n_scoring + 2) * 2.0 ** -23
        if dtype == np.float32
        else 1.0 + 2.0 ** -40
    )
    bounds = bounds * pad
    # per-doc accumulation order must match _group_candidates exactly:
    # every scoring cursor (base + group members) in sorted-term order
    allc_sorted = (
        sorted(all_scoring, key=lambda c: c.term) if groups else None
    )

    _set_path("pruned")
    order = np.argsort(-bounds, kind="stable")
    heap: List[Tuple[float, int]] = []  # (score, -doc_id), heap[0] = worst
    not_docs = _NotCursorView.all_docs(not_cursors) if not_cursors else None
    # cost-based fallback (Lucene analogue: BooleanScorerSupplier picks a
    # bulk scorer when WAND-style pruning can't win,
    # search/BooleanScorerSupplier.java:398-418): probe the highest-bound
    # intervals first; if the threshold leaves most intervals alive, the
    # per-interval machinery costs more than one vectorized exhaustive pass.
    n_feasible = int(feasible.sum())
    probe_budget = 8
    probed = 0
    for i in order:
        if not feasible[i]:
            continue
        if len(heap) == k and bounds[i] < heap[0][0]:
            break
        if probed == probe_budget and n_feasible > 64:
            thr = heap[0][0] if len(heap) == k else -np.inf
            alive = int((bounds[feasible] >= thr).sum())
            if alive > 0.25 * n_feasible:
                _set_path("exhaustive:cost-fallback")
                return score_exhaustive(
                    reader, query, k,
                    _prep=(cursors, is_must, not_cursors, dtype, groups),
                )
        probed += 1
        lo = int(starts[i])
        hi = int(edges[i + 1]) - 1
        if groups:
            cand, acc = _combine_groups(
                cursors, is_must, n_must, msm, groups, allc_sorted,
                not_docs, dtype, lo, hi,
            )
        else:
            per_term = [c.docs_in(lo, hi) for c in cursors]
            cand, acc = _combine(
                per_term, is_must, n_must, msm, not_docs, dtype
            )
        if fdocs is not None and len(cand):
            # FILTER doc-wise intersection inside the pruned loop (filter
            # docs are sorted unique; candidates are sorted)
            pos = np.minimum(np.searchsorted(fdocs, cand), len(fdocs) - 1)
            fkeep = fdocs[pos] == cand
            cand, acc = cand[fkeep], acc[fkeep]
        if len(cand) == 0:
            continue
        # vectorized pre-filter: only candidates at/above the current kth
        # score can enter the heap (>= keeps doc-id tie-break candidates)
        if len(heap) == k:
            mask = acc.astype(np.float64) >= heap[0][0]
            cand, acc = cand[mask], acc[mask]
        for d, s in zip(cand, acc):
            entry = (float(s), -int(d))
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    docs = np.array([-e[1] for e in out], dtype=np.int64)
    scores = np.array([e[0] for e in out], dtype=dtype)
    return docs, scores


def score_covering(reader, terms, field: str, k: int = 10):
    """CoveringQuery (reference: sandbox/src/java/org/apache/lucene/
    sandbox/search/CoveringQuery.java:51-76 + CoveringScorer.java): SHOULD
    term clauses with a PER-DOC minimum-should-match read from a numeric
    doc-values source. A doc matches iff its matching-clause count is
    >= max(1, minMatch(doc)); the score is the sum of the matching
    clauses' similarity scores, accumulated in sorted-unique-term order
    (the engine's reproducible float-sum convention). Extends the
    constant-msm executor: the threshold becomes a per-candidate vector
    gathered from the doc-values sidecar."""
    terms = sorted(set(terms))
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    deleted = getattr(reader, "deleted", None)
    full_cache = reader.__dict__.setdefault("_scored_full", LruDict(512))
    per = []
    for t in terms:
        df, ttf = reader.term_stats(t)
        if df == 0:
            continue
        scorer = _term_scorer(reader, df, ttf)
        cur = TermCursor(t, reader.postings(t), scorer, full_cache,
                         deleted=deleted)
        d, s = cur.decode_all()
        if len(d):
            per.append((d, s))
    if not per:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype)
    cand = np.unique(np.concatenate([d for d, _ in per]))
    acc = np.zeros(len(cand), dtype=dtype)
    cnt = np.zeros(len(cand), dtype=np.int64)
    for d, s in per:
        pos = np.searchsorted(cand, d)
        acc[pos] += s.astype(dtype, copy=False)
        cnt[pos] += 1
    need = np.maximum(
        np.asarray(reader.doc_values_for(field, cand), dtype=np.int64), 1
    )
    keep = cnt >= need
    return _topk_from(cand[keep], acc[keep], k)
