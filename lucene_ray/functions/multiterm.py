"""Multi-term query expansion: prefix / wildcard / fuzzy.

Reference: search/PrefixQuery.java, search/WildcardQuery.java,
search/FuzzyQuery.java rewritten through MultiTermQuery's
SCORING_BOOLEAN_REWRITE (search/MultiTermQuery.java,
search/ScoringRewrite.java): the pattern expands against the term
dictionary into a disjunction of term queries, each scored with its own
BM25 idf, capped at the clause limit (IndexSearcher.java:80, 1024).

Deviations, chosen for an exactly-reproducible SQL oracle and documented
here: patterns are lowercased (classic QueryParser's
lowercase_expanded_terms) but never stemmed or stop-filtered; fuzzy
distance is plain Levenshtein — FuzzyQuery(transpositions=false) — so
DuckDB's editdist3 matches it; expansion order (and the cap cut) is
lexicographic term order, deterministic across partitionings.

The reference intersects a compiled automaton with the term-dict FST
(search/AutomatonQuery.java). Ours: the sorted vocabulary list supports a
bisect range scan for the literal prefix of any pattern ('' for leading
wildcards), then a compiled-regex / banded-DP filter over that range.
"""

from __future__ import annotations

import bisect
import re
from typing import List, Optional, Sequence, Tuple

import numpy as np

#: expansion cap — the BooleanQuery clause limit analogue
MAX_EXPANSIONS = 1024

#: (kind, pattern, arg) clause kinds
KINDS = ("prefix", "wildcard", "fuzzy", "dfuzzy", "regexp", "trange")

#: trange arg bit flags (includeLower / includeUpper)
TRANGE_INCL_LO = 1
TRANGE_INCL_HI = 2


def regex_literal_prefix(pattern: str) -> str:
    """Conservative literal prefix of a regex — bounds the sorted-vocab scan
    like AutomatonQuery's common-prefix optimization (search/RegexpQuery.java
    + the automaton's getCommonPrefix). Conservatisms: a top-level-looking
    ``|`` anywhere voids the prefix (either branch may start differently),
    and a quantifier (``? * {``) right after the prefix makes its last char
    optional, so that char is dropped."""
    if "|" in pattern:
        return ""
    out = []
    stop = None
    for ch in pattern:
        if ch in ".?*+()[]{}\\^$":
            stop = ch
            break
        out.append(ch)
    if out and stop in ("?", "*", "{"):
        out.pop()  # quantifier makes the preceding char optional
    return "".join(out)


def wildcard_regex(pattern: str) -> str:
    """Translate Lucene wildcard syntax (* = any run, ? = one char) to an
    anchored regex (WildcardQuery.java:toAutomaton analogue)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def literal_prefix(pattern: str) -> str:
    """Longest literal prefix before the first wildcard char."""
    for i, ch in enumerate(pattern):
        if ch in "*?":
            return pattern[:i]
    return pattern


def literal_suffix(pattern: str) -> str:
    """Longest literal suffix after the last wildcard char."""
    for i in range(len(pattern) - 1, -1, -1):
        if pattern[i] in "*?":
            return pattern[i + 1:]
    return pattern


def prefix_successor(prefix: str) -> Optional[str]:
    """Smallest string strictly greater than every string starting with
    ``prefix`` — the exact upper bound for a sorted-vocab prefix scan.
    Appending U+FFFF (the old bound) missed terms whose first post-prefix
    codepoint is supplementary-plane (e.g. emoji with keyword analyzers);
    incrementing the last non-U+10FFFF codepoint is exact. None means
    'no upper bound' (prefix of all-U+10FFFF)."""
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < 0x10FFFF:
            return prefix[:i] + chr(cp + 1)
    return None


def levenshtein_within(
    cands: Sequence[str], query: str, max_edits: int
) -> List[str]:
    """Candidates at plain Levenshtein distance <= max_edits from query.

    Vectorized column-DP: all same-length candidates are stacked into a
    codepoint matrix and the DP advances one query character at a time
    over the whole stack (numpy), instead of a per-candidate Python loop.
    """
    if max_edits == 0:
        return [c for c in cands if c == query]
    q = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    m = len(q)
    by_len = {}
    for c in cands:
        if abs(len(c) - m) <= max_edits:
            by_len.setdefault(len(c), []).append(c)
    out = []
    for n, grp in by_len.items():
        if n == 0:
            if m <= max_edits:
                out.extend(grp)
            continue
        mat = np.empty((len(grp), n), dtype=np.uint32)
        for i, c in enumerate(grp):
            mat[i] = np.frombuffer(c.encode("utf-32-le"), dtype=np.uint32)
        # dp[g, j] = distance(query[:i], cand[:j]) for all group rows g
        js = np.arange(1, n + 1, dtype=np.int32)
        dp = np.broadcast_to(
            np.arange(n + 1, dtype=np.int32), (len(grp), n + 1)
        ).copy()
        for i in range(1, m + 1):
            prev = dp
            # t[j] = min(substitute, delete) — no within-row dependence
            t = np.minimum(
                prev[:, :-1] + (mat != q[i - 1]).astype(np.int32),
                prev[:, 1:] + 1,
            )
            # insertion closes over the row: dp[i][j] = min over k<=j of
            # (t[k] + j - k, i + j) -> min-plus prefix scan of u[k]=t[k]-k
            u = t - js
            np.minimum.accumulate(u, axis=1, out=u)
            np.minimum(u, np.int32(i), out=u)  # path through dp[i][0] = i
            dp = np.empty_like(prev)
            dp[:, 0] = i
            dp[:, 1:] = u + js
        out.extend(c for i, c in enumerate(grp) if dp[i, n] <= max_edits)
    return out


def damerau_within(
    cands: Sequence[str], query: str, max_edits: int
) -> List[str]:
    """Candidates at Damerau-Levenshtein distance <= max_edits from query
    — FuzzyQuery's DEFAULT metric (search/FuzzyQuery.java:61-76,
    transpositions=true: insert/delete/substitute plus transposition of
    adjacent characters as one edit).

    Variant note (documented): this is the FULL (unrestricted,
    Lowrance-Wagner) Damerau-Levenshtein — exactly DuckDB's
    ``damerau_levenshtein``, so the SQL oracle reproduces it bit-for-bit.
    The reference's parametric Levenshtein automaton is the
    optimal-string-alignment restriction; the two differ only when an
    edit lands BETWEEN two transposed characters (``ca -> abc``: full 2,
    OSA 3), which full-DL counts more permissively.

    Same vectorized stacking as :func:`levenshtein_within`: all
    same-length candidates advance one query character per step; the
    transposition term gathers d[k-1, l-1] with per-cell (k, l) last-
    occurrence indexes, and insertions close over the row via the
    min-plus prefix scan."""
    if max_edits == 0:
        return [c for c in cands if c == query]
    q = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    m = len(q)
    by_len = {}
    for c in cands:
        if abs(len(c) - m) <= max_edits:
            by_len.setdefault(len(c), []).append(c)
    big = np.int32(1 << 20)
    out = []
    for n, grp in by_len.items():
        if n == 0:
            if m <= max_edits:
                out.extend(grp)
            continue
        g = len(grp)
        mat = np.empty((g, n), dtype=np.uint32)
        for i, c in enumerate(grp):
            mat[i] = np.frombuffer(c.encode("utf-32-le"), dtype=np.uint32)
        js = np.arange(1, n + 1, dtype=np.int32)
        # full row history: the transposition term reaches back to
        # arbitrary earlier rows (d[k-1][l-1])
        D = np.empty((m + 1, g, n + 1), dtype=np.int32)
        D[0] = np.arange(n + 1, dtype=np.int32)
        gidx = np.arange(g)[:, None]
        # karr[g, j] = last 1-based i' (< current i) with q[i'] == mat[g, j]
        karr = np.zeros((g, n), dtype=np.int32)
        for i in range(1, m + 1):
            prev = D[i - 1]
            eqr = mat == q[i - 1]
            t = np.minimum(
                prev[:, :-1] + (~eqr).astype(np.int32),  # substitute
                prev[:, 1:] + 1,                         # delete
            )
            if i >= 2:
                # l[g, j] = last 1-based j' < j with mat[g, j'-1] == q[i-1]
                pos = np.where(eqr, js, np.int32(0))
                larr = np.empty_like(pos)
                larr[:, 0] = 0
                np.maximum.accumulate(pos[:, :-1], axis=1, out=larr[:, 1:])
                k = karr
                valid = (k >= 1) & (larr >= 1)
                trans = (
                    D[
                        np.maximum(k - 1, 0),
                        gidx,
                        np.maximum(larr - 1, 0),
                    ]
                    + (i - k - 1) + 1 + (js[None, :] - larr - 1)
                )
                np.minimum(t, np.where(valid, trans, big), out=t)
            # insertion closure: min-plus prefix scan + path through col 0
            u = t - js
            np.minimum.accumulate(u, axis=1, out=u)
            np.minimum(u, np.int32(i), out=u)
            D[i, :, 0] = i
            D[i, :, 1:] = u + js
            karr = np.where(eqr, np.int32(i), karr)
        fin = D[m, :, n]
        out.extend(c for i, c in enumerate(grp) if fin[i] <= max_edits)
    return out


def prefix_edit_distance(
    cands: Sequence[str], prefix: str, max_edits: int
) -> dict:
    """{candidate: d} where d = min over m>=1 of
    levenshtein(candidate[:m], prefix), kept when d <= max_edits — the
    FuzzySuggester prefix-automaton acceptance (a completion matches when
    SOME prefix of it is within max_edits of what was typed). Same
    vectorized column-DP as :func:`levenshtein_within`; the answer is the
    min over the final DP row's columns instead of its last cell."""
    q = np.frombuffer(prefix.encode("utf-32-le"), dtype=np.uint32)
    m = len(q)
    if m == 0:
        return {}
    by_len = {}
    for c in cands:
        if len(c) >= 1:
            by_len.setdefault(len(c), []).append(c)
    out = {}
    for n, grp in by_len.items():
        mat = np.empty((len(grp), n), dtype=np.uint32)
        for i, c in enumerate(grp):
            mat[i] = np.frombuffer(c.encode("utf-32-le"), dtype=np.uint32)
        js = np.arange(1, n + 1, dtype=np.int32)
        dp = np.broadcast_to(
            np.arange(n + 1, dtype=np.int32), (len(grp), n + 1)
        ).copy()
        for i in range(1, m + 1):
            prev = dp
            t = np.minimum(
                prev[:, :-1] + (mat != q[i - 1]).astype(np.int32),
                prev[:, 1:] + 1,
            )
            u = t - js
            np.minimum.accumulate(u, axis=1, out=u)
            np.minimum(u, np.int32(i), out=u)
            dp = np.empty_like(prev)
            dp[:, 0] = i
            dp[:, 1:] = u + js
        dmin = dp[:, 1:].min(axis=1)
        for i, c in enumerate(grp):
            if int(dmin[i]) <= max_edits:
                out[c] = int(dmin[i])
    return out


def prefix_damerau_distance(
    cands: Sequence[str], prefix: str, max_edits: int
) -> dict:
    """{candidate: d} where d = min over m>=1 of full
    Damerau-Levenshtein(candidate[:m], prefix), kept when d <= max_edits
    — FuzzySuggester's prefix acceptance under its DEFAULT
    transpositions=true metric (suggest/.../analyzing/FuzzySuggester.java
    DEFAULT_TRANSPOSITIONS). Same full-DL DP as :func:`damerau_within`
    (the unrestricted Lowrance-Wagner variant DuckDB's
    ``damerau_levenshtein`` computes, so SQL oracles reproduce it
    bit-for-bit); the answer is the min over the final row's columns
    instead of its last cell."""
    q = np.frombuffer(prefix.encode("utf-32-le"), dtype=np.uint32)
    m = len(q)
    if m == 0:
        return {}
    by_len = {}
    for c in cands:
        if len(c) >= max(1, m - max_edits):
            by_len.setdefault(len(c), []).append(c)
    big = np.int32(1 << 20)
    out = {}
    for n, grp in by_len.items():
        g = len(grp)
        mat = np.empty((g, n), dtype=np.uint32)
        for i, c in enumerate(grp):
            mat[i] = np.frombuffer(c.encode("utf-32-le"), dtype=np.uint32)
        js = np.arange(1, n + 1, dtype=np.int32)
        D = np.empty((m + 1, g, n + 1), dtype=np.int32)
        D[0] = np.arange(n + 1, dtype=np.int32)
        gidx = np.arange(g)[:, None]
        karr = np.zeros((g, n), dtype=np.int32)
        for i in range(1, m + 1):
            prev = D[i - 1]
            eqr = mat == q[i - 1]
            t = np.minimum(
                prev[:, :-1] + (~eqr).astype(np.int32),  # substitute
                prev[:, 1:] + 1,                         # delete
            )
            if i >= 2:
                pos = np.where(eqr, js, np.int32(0))
                larr = np.empty_like(pos)
                larr[:, 0] = 0
                np.maximum.accumulate(pos[:, :-1], axis=1, out=larr[:, 1:])
                k = karr
                valid = (k >= 1) & (larr >= 1)
                trans = (
                    D[
                        np.maximum(k - 1, 0),
                        gidx,
                        np.maximum(larr - 1, 0),
                    ]
                    + (i - k - 1) + 1 + (js[None, :] - larr - 1)
                )
                np.minimum(t, np.where(valid, trans, big), out=t)
            u = t - js
            np.minimum.accumulate(u, axis=1, out=u)
            np.minimum(u, np.int32(i), out=u)
            D[i, :, 0] = i
            D[i, :, 1:] = u + js
            karr = np.where(eqr, np.int32(i), karr)
        dmin = D[m, :, 1:].min(axis=1)
        for i, c in enumerate(grp):
            if int(dmin[i]) <= max_edits:
                out[c] = int(dmin[i])
    return out


def expand(kind: str, pattern: str, arg: int, vocab: Sequence[str],
           rvocab: Optional[Sequence[str]] = None) -> List[str]:
    """Matching terms from a SORTED vocabulary, lexicographic order,
    capped at MAX_EXPANSIONS.

    ``rvocab`` (optional): the character-REVERSED terms, sorted — the
    ReverseStringFilter / ReversedWildcardFilter acceleration
    (analysis/common/.../reverse/ReverseStringFilter.java): a
    leading-wildcard pattern with a literal suffix (``*ing``, ``?at``)
    becomes a prefix scan over the reversed dictionary instead of a
    full-vocabulary regex walk; results are re-sorted so the output is
    identical to the unaccelerated path."""
    if kind == "prefix":
        lo = bisect.bisect_left(vocab, pattern)
        succ = prefix_successor(pattern)
        hi = bisect.bisect_left(vocab, succ) if succ is not None else len(vocab)
        return list(vocab[lo:hi])[:MAX_EXPANSIONS]
    if kind == "wildcard":
        pre = literal_prefix(pattern)
        rx = re.compile(wildcard_regex(pattern))
        if not pre and rvocab is not None:
            rsuf = literal_suffix(pattern)[::-1]
            if rsuf:
                lo = bisect.bisect_left(rvocab, rsuf)
                succ = prefix_successor(rsuf)
                hi = (bisect.bisect_left(rvocab, succ)
                      if succ is not None else len(rvocab))
                got = sorted(
                    rt[::-1] for rt in rvocab[lo:hi]
                    if rx.fullmatch(rt[::-1])
                )
                return got[:MAX_EXPANSIONS]
        lo = bisect.bisect_left(vocab, pre)
        succ = prefix_successor(pre) if pre else None
        hi = bisect.bisect_left(vocab, succ) if succ is not None else len(vocab)
        return [t for t in vocab[lo:hi] if rx.fullmatch(t)][:MAX_EXPANSIONS]
    if kind == "fuzzy":
        return sorted(levenshtein_within(vocab, pattern, arg))[:MAX_EXPANSIONS]
    if kind == "dfuzzy":
        # FuzzyQuery's transpositions=true DEFAULT (FuzzyQuery.java:61-76)
        return sorted(damerau_within(vocab, pattern, arg))[:MAX_EXPANSIONS]
    if kind == "regexp":
        # reference: search/RegexpQuery.java — regex anchored over the full
        # term; the literal prefix bounds the dictionary scan
        pre = regex_literal_prefix(pattern)
        lo = bisect.bisect_left(vocab, pre)
        succ = prefix_successor(pre) if pre else None
        hi = bisect.bisect_left(vocab, succ) if succ is not None else len(vocab)
        rx = re.compile(pattern)
        return [t for t in vocab[lo:hi] if rx.fullmatch(t)][:MAX_EXPANSIONS]
    if kind == "trange":
        # reference: search/TermRangeQuery.java — every term in the
        # lexicographic [lower, upper] range of the sorted dictionary,
        # inclusivity per end from the arg bit flags; '' as either bound
        # means open-ended (the classic parser's `[a TO *]`). Like the
        # reference's rewrite the scan is a pure dictionary range — two
        # bisects, no per-term predicate.
        lo_s, hi_s = pattern.split("\x00", 1)
        if lo_s == "":
            lo = 0
        elif arg & TRANGE_INCL_LO:
            lo = bisect.bisect_left(vocab, lo_s)
        else:
            lo = bisect.bisect_right(vocab, lo_s)
        if hi_s == "":
            hi = len(vocab)
        elif arg & TRANGE_INCL_HI:
            hi = bisect.bisect_right(vocab, hi_s)
        else:
            hi = bisect.bisect_left(vocab, hi_s)
        return list(vocab[lo:hi])[:MAX_EXPANSIONS]
    raise ValueError(f"unknown multi-term kind: {kind}")


def resolve_multi(query, expander, cache: dict = None):
    """-> a plain BooleanQuery with every (kind, pattern, arg, role) clause
    in ``query.multi`` expanded into concrete should / must_not terms.

    ``expander`` is either a callable ``(kind, pattern, arg) -> [terms]``
    (e.g. ``IndexReader.expand_multi``) or a sorted vocabulary sequence
    (tests / the brute-force oracle). ``cache`` memoizes per clause."""
    from .query import BooleanQuery

    if not getattr(query, "multi", ()):
        return query
    should = list(query.should)
    must_not = list(query.must_not)
    groups = list(getattr(query, "must_groups", ()))
    for kind, pattern, arg, role in query.multi:
        key = (kind, pattern, arg)
        terms = cache.get(key) if cache is not None else None
        if terms is None:
            if callable(expander):
                terms = expander(kind, pattern, arg)
            else:
                terms = expand(kind, pattern, arg, expander)
            if cache is not None:
                cache[key] = terms
        if role == "must":
            # required-OR group: doc must match >=1 expansion (nested
            # boolean under a MUST occur); empty expansion = no possible
            # match, represented as an empty group the executor rejects
            groups.append(tuple(terms))
        else:
            (must_not if role == "must_not" else should).extend(terms)
    return BooleanQuery(
        must=query.must,
        should=tuple(should),
        must_not=tuple(must_not),
        minimum_should_match=query.minimum_should_match,
        boosts=getattr(query, "boosts", ()),
        filters=getattr(query, "filters", ()),
        must_groups=tuple(groups),
    )


def phrase_wildcard_query(slots, expander, max_expansions: int = None):
    """PhraseWildcardQuery builder (reference: sandbox/src/java/org/
    apache/lucene/sandbox/search/PhraseWildcardQuery.java:67-124 — a
    generalized PhraseQuery where any slot may be a MultiTermQuery; the
    reference controls the total expansion budget then matches and
    scores exactly like MultiPhraseQuery over the expanded term sets,
    and rewrites to MatchNoDocsQuery when a slot has no matching term).

    ``slots``: sequence of ``("term", text)`` or ``(kind, pattern[, arg])``
    with ``kind`` from :func:`expand` (prefix/wildcard/regexp/fuzzy/
    trange). ``expander``: callable ``(kind, pattern, arg) -> [terms]``
    (``IndexReader.expand_multi``) or a sorted vocabulary list.
    ``max_expansions`` caps each slot AFTER the lexicographic expansion
    (the reference's maxMultiTermExpansions budget, applied per slot).

    -> a :class:`..query.MultiPhrase` (consecutive offsets), or ``None``
    when any slot expands to zero terms (MatchNoDocsQuery analogue).
    """
    arrays = []
    for slot in slots:
        kind = slot[0]
        if kind == "term":
            terms = [slot[1]]
        else:
            arg = int(slot[2]) if len(slot) > 2 else 0
            if callable(expander):
                terms = expander(kind, slot[1], arg)
            else:
                terms = expand(kind, slot[1], arg, expander)
            if max_expansions is not None:
                terms = list(terms)[:max_expansions]
        if not terms:
            return None
        arrays.append(tuple(terms))
    from .query import MultiPhrase

    return MultiPhrase(
        term_arrays=tuple(arrays), offsets=tuple(range(len(arrays)))
    )


def parse_complex_phrase(text: str, analyzer):
    """ComplexPhraseQueryParser subset (reference: queryparser/src/java/
    org/apache/lucene/queryparser/complexPhrase/
    ComplexPhraseQueryParser.java:49-77 — quoted phrases whose words may
    embed wildcard/fuzzy syntax, rewritten against the dictionary and
    run as a position-aware query). Parses ``"w1 w2 ..."`` (quotes
    optional) into the slot list :func:`phrase_wildcard_query` consumes:

    * ``pre*`` (star only, at the end)      -> ("prefix", pre)
    * any other ``*``/``?`` word            -> ("wildcard", word)
    * ``word~N``                            -> ("fuzzy", word, N)
    * plain word                            -> ("term", analyzed token)

    Plain words run through the analyzer; a word the analyzer DROPS
    (stopword) is removed and the remaining slots close ranks —
    documented deviation from the reference, which keeps position
    holes. Raises when a plain word analyzes to several tokens or
    nothing matchable remains."""
    inner = text.strip()
    if inner.startswith('"') and inner.endswith('"') and len(inner) >= 2:
        inner = inner[1:-1]
    slots = []
    for word in inner.split():
        if "*" in word or "?" in word:
            body = word.lower()
            if body.endswith("*") and "*" not in body[:-1] and "?" not in body:
                slots.append(("prefix", body[:-1]))
            else:
                slots.append(("wildcard", body))
            continue
        if "~" in word:
            base, _, n = word.partition("~")
            if not base:
                raise ValueError(f"bad fuzzy word: {word!r}")
            slots.append(("fuzzy", base.lower(), int(n) if n else 2))
            continue
        toks = analyzer.analyze(word)
        if len(toks) > 1:
            raise ValueError(
                f"complex-phrase word {word!r} analyzes to several tokens"
            )
        if toks:  # stopword words drop and slots close ranks
            slots.append(("term", toks[0]))
    if len(slots) < 2:
        raise ValueError("complex phrase needs >= 2 effective words")
    return slots
