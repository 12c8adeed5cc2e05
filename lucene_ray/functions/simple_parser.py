"""SimpleQueryParser — the fault-tolerant human query syntax.

Reference: ``queryparser/src/java/org/apache/lucene/queryparser/simple/
SimpleQueryParser.java`` (the whole 661-line state machine; test goldens
mirrored from ``TestSimpleQueryParser.java``). The parser NEVER raises on
malformed input: unbalanced ``(`` / ``"`` are ignored, doubled ``-``
cancels, stray operators are dropped — "do its best to interpret what to
search for no matter how poorly composed the request may be".

Syntax (each feature gated by a flag bit, same values as the reference):

* ``+`` AND, ``|`` OR, whitespace = the default operator
* ``-token`` negation (odd run of ``-`` negates; wraps as the reference's
  ``BooleanQuery(MUST_NOT inner, SHOULD MatchAllDocsQuery)`` so a negated
  clause MATCHES every doc without the inner query, scoring the
  MatchAll's constant 1.0 — SimpleQueryParser.java:452-459)
* ``"a b"`` phrase, ``"a b"~N`` near (slop N)
* ``term*`` prefix (trailing unescaped ``*`` only), ``term~N`` fuzzy
  (``~`` alone = 2; clamped to LevenshteinAutomata max 2; fuzziness 0 or
  unparsable suffix = plain term; FuzzyQuery's transpositions=true
  default -> the engine's ``dfuzzy`` Damerau kind)
* ``( )`` precedence, ``\\`` escape

Operator precedence is the reference's peculiar LEFT-fold: every time the
operator CHANGES, the tree built so far is wrapped as a single clause of
a fresh BooleanQuery (buildQueryTree, :444-490) — ``a|b c`` parses as
``(a OR b) AND c``, ``a b|c`` as ``(a AND b) OR c``.

Engine mapping: flat runs of same-occur terms fold into one
``BooleanQuery``; phrase / sub-boolean / negation clauses become
``NestedQuery`` children; MUST multi-term clauses wrap as single-clause
required children (the classic parser's must_groups rewrite). DOCUMENTED
DEVIATION (same contract as NestedQuery): score accumulation is base
terms first, then children in clause order — the reference sums clauses
in declaration order; matching sets are identical.

Scope: single-field (the reference's ``Map<String, Float> weights``
multi-field constructor is not exposed here — cross-field search goes
through ``pipelines/multifield.py``, which owns per-field stats/boosts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from .query import (
    BooleanQuery,
    MatchAllQuery,
    NestedQuery,
    PhraseQuery,
    TermQuery,
)

# flag bits — SimpleQueryParser.java:110-139
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9

#: LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE
_MAX_EDITS = 2

_WS = {" ", "\t", "\n", "\r"}


@dataclass(frozen=True)
class _MultiLeaf:
    """An unanalyzed expanded-clause leaf (prefix / dfuzzy pattern)."""

    kind: str
    pattern: str
    arg: int = 0


@dataclass
class _SNode:
    """BooleanQuery under construction: (occur, child) clauses in parse
    order; children are engine nodes, leaves, or nested _SNodes."""

    clauses: List[Tuple[str, object]] = field(default_factory=list)


@dataclass
class _State:
    """Port of SimpleQueryParser.State (:640-660)."""

    data: str
    index: int
    length: int
    current_op: Optional[str] = None
    previous_op: Optional[str] = None
    not_count: int = 0
    top: object = None


class SimpleQueryParserError(ValueError):
    """Never raised by parse() — exists for API symmetry only."""


def parse_simple_query(text: str, analyzer, default_operator: str = "must",
                       flags: int = -1):
    """Parse ``text`` -> an engine query (TermQuery / PhraseQuery /
    BooleanQuery / NestedQuery / MatchAllQuery), or an EMPTY
    ``BooleanQuery()`` for no-op input (the reference's MatchNoDocsQuery
    — an empty boolean matches nothing in this engine too).

    ``default_operator`` is "must" (the reference test suite's setting)
    or "should" (the reference's own default); ``flags`` gates features
    (default -1 = everything on)."""
    if default_operator not in ("must", "should"):
        raise ValueError("default operator must be 'must' or 'should'")
    if text.strip() == "*":
        return MatchAllQuery()
    state = _State(data=text, index=0, length=len(text))
    _parse_sub_query(state, analyzer, default_operator, flags)
    if state.top is None:
        return BooleanQuery()
    return _compile(state.top)


# ---------------------------------------------------------------------------
# the state machine — a faithful port of parseSubQuery/consume* (:175-478)
# ---------------------------------------------------------------------------


def _parse_sub_query(state: _State, an, default_op: str, flags: int) -> None:
    while state.index < state.length:
        c = state.data[state.index]
        if c == "(" and flags & PRECEDENCE_OPERATORS:
            _consume_sub_query(state, an, default_op, flags)
        elif c == ")" and flags & PRECEDENCE_OPERATORS:
            state.index += 1  # extraneous, ignored
        elif c == '"' and flags & PHRASE_OPERATOR:
            _consume_phrase(state, an, default_op, flags)
        elif c == "+" and flags & AND_OPERATOR:
            # ignored if an op is already pending or nothing precedes it
            if state.current_op is None and state.top is not None:
                state.current_op = "must"
            state.index += 1
        elif c == "|" and flags & OR_OPERATOR:
            if state.current_op is None and state.top is not None:
                state.current_op = "should"
            state.index += 1
        elif c == "-" and flags & NOT_OPERATOR:
            # two '-' in a row cancel; even whitespace resets the run
            state.not_count += 1
            state.index += 1
            continue  # skip the not_count reset below
        elif c in _WS and flags & WHITESPACE_OPERATOR:
            state.index += 1
        else:
            _consume_token(state, an, default_op, flags)
        state.not_count = 0


def _consume_sub_query(state: _State, an, default_op: str,
                       flags: int) -> None:
    start = state.index = state.index + 1
    precedence = 1
    escaped = False
    while state.index < state.length:
        if not escaped:
            c = state.data[state.index]
            if c == "\\" and flags & ESCAPE_OPERATOR:
                escaped = True
                state.index += 1
                continue
            if c == "(":
                precedence += 1
            elif c == ")":
                precedence -= 1
                if precedence == 0:
                    break
        escaped = False
        state.index += 1
    if state.index == state.length:
        # no closing paren: the '(' is extraneous; re-parse its content
        state.index = start
    elif state.index == start:
        # '()' — resets the pending operation (it would have applied here)
        state.current_op = None
        state.index += 1
    else:
        sub = _State(data=state.data, index=start, length=state.index)
        _parse_sub_query(sub, an, default_op, flags)
        _build_query_tree(state, sub.top, default_op)
        state.index += 1


def _consume_phrase(state: _State, an, default_op: str, flags: int) -> None:
    start = state.index = state.index + 1
    buf: List[str] = []
    escaped = False
    has_slop = False
    while state.index < state.length:
        if not escaped:
            c = state.data[state.index]
            if c == "\\" and flags & ESCAPE_OPERATOR:
                escaped = True
                state.index += 1
                continue
            if c == '"':
                if (state.length > state.index + 1
                        and state.data[state.index + 1] == "~"
                        and flags & NEAR_OPERATOR):
                    state.index += 1  # now at '~'
                    if state.length > state.index + 1:
                        has_slop = True
                    break
                break
        escaped = False
        buf.append(state.data[state.index])
        state.index += 1
    if state.index == state.length:
        state.index = start  # unbalanced quote: ignored
    elif state.index == start:
        state.current_op = None  # empty phrase resets the pending op
        state.index += 1
    else:
        phrase = "".join(buf)
        slop = _parse_fuzziness(state, flags) if has_slop else 0
        _build_query_tree(state, _phrase_leaf(phrase, slop, an, default_op),
                          default_op)
        state.index += 1


def _consume_token(state: _State, an, default_op: str, flags: int) -> None:
    buf: List[str] = []
    escaped = False
    prefix = False
    fuzzy = False
    while state.index < state.length:
        if not escaped:
            c = state.data[state.index]
            if c == "\\" and flags & ESCAPE_OPERATOR:
                escaped = True
                prefix = False
                state.index += 1
                continue
            if _token_finished(state, flags):
                break
            if buf and c == "~" and flags & FUZZY_OPERATOR:
                fuzzy = True
                break
            # prefix tracks whether the LAST copied char is an
            # unescaped '*' with at least one char before it
            prefix = bool(buf) and c == "*" and bool(flags & PREFIX_OPERATOR)
        escaped = False
        buf.append(state.data[state.index])
        state.index += 1
    if not buf:
        return
    if fuzzy:
        token = "".join(buf)
        fuzziness = min(_parse_fuzziness(state, flags), _MAX_EDITS)
        if fuzziness == 0:
            branch = _default_leaf(token, an, default_op)
        else:
            # FuzzyQuery defaults transpositions=true (FuzzyQuery.java:
            # 61-76) -> the Damerau kind; pattern normalized, not
            # analyzed (QueryBuilder analyzer.normalize = lowercase)
            branch = _MultiLeaf("dfuzzy", token.lower(), fuzziness)
    elif prefix:
        branch = _MultiLeaf("prefix", "".join(buf[:-1]).lower(), 0)
    else:
        branch = _default_leaf("".join(buf), an, default_op)
    _build_query_tree(state, branch, default_op)


def _parse_fuzziness(state: _State, flags: int) -> int:
    """Port of parseFuzziness (:493-534): state.index sits ON the '~';
    collect chars until a token delimiter; empty -> 2, unparsable -> 0,
    negative -> 0."""
    if state.index >= state.length or state.data[state.index] != "~":
        return 0
    buf: List[str] = []
    while state.index < state.length:
        state.index += 1
        if state.index < state.length:
            if _token_finished(state, flags):
                break
            buf.append(state.data[state.index])
    s = "".join(buf)
    if not s:
        return 2
    # Java's Integer.parseInt: optional sign then digits ONLY — Python's
    # int() also accepts underscores ("1_1"), which must stay unparsable
    import re

    if re.fullmatch(r"[+-]?[0-9]+", s) is None:
        return 0
    return max(int(s), 0)


def _token_finished(state: _State, flags: int) -> bool:
    c = state.data[state.index]
    return (
        (c == '"' and bool(flags & PHRASE_OPERATOR))
        or (c == "|" and bool(flags & OR_OPERATOR))
        or (c == "+" and bool(flags & AND_OPERATOR))
        or (c in "()" and bool(flags & PRECEDENCE_OPERATORS))
        or (c in _WS and bool(flags & WHITESPACE_OPERATOR))
    )


# ---------------------------------------------------------------------------
# tree building — port of buildQueryTree/addClause (:434-490)
# ---------------------------------------------------------------------------


def _build_query_tree(state: _State, branch, default_op: str) -> None:
    if branch is None:
        return  # the currentOperation stays pending (reference :487)
    if state.not_count % 2 == 1:
        branch = _SNode([("must_not", branch), ("should", MatchAllQuery())])
    if state.top is None:
        state.top = branch
    else:
        if state.current_op is None:
            state.current_op = default_op
        if state.previous_op != state.current_op:
            # operator changed: the whole tree so far becomes ONE clause
            # of a fresh boolean — the reference's left-fold precedence
            state.top = _SNode([(state.current_op, state.top)])
        state.top.clauses.append((state.current_op, branch))
        state.previous_op = state.current_op
    state.current_op = None


def _default_leaf(token: str, an, default_op: str):
    """newDefaultQuery -> createBooleanQuery(field, text, defaultOp)
    (:555-567): 0 analyzed terms -> None, 1 -> TermQuery, n -> boolean
    of the terms under the default operator."""
    terms = an.analyze(token)
    if not terms:
        return None
    if len(terms) == 1:
        return TermQuery(terms[0])
    return BooleanQuery(**{default_op: tuple(terms)})


def _phrase_leaf(text: str, slop: int, an, default_op: str):
    """newPhraseQuery -> createPhraseQuery(field, text, slop) (:589-601):
    position gaps from dropped stopwords preserved, 1 term -> TermQuery."""
    terms, pos = an.analyze_positions(text)
    if not terms:
        return None
    if len(terms) == 1:
        return TermQuery(terms[0])
    return PhraseQuery(
        terms=tuple(terms),
        offsets=tuple(p - pos[0] for p in pos),
        slop=slop,
    )


# ---------------------------------------------------------------------------
# compile the parse tree into engine dataclasses
# ---------------------------------------------------------------------------


def _compile(node):
    if not isinstance(node, _SNode):
        if isinstance(node, _MultiLeaf):
            return BooleanQuery(
                multi=((node.kind, node.pattern, node.arg, "should"),)
            )
        return node
    must: List[str] = []
    should: List[str] = []
    must_not: List[str] = []
    multi: List[Tuple[str, str, int, str]] = []
    children: List[Tuple[str, object]] = []
    for occur, raw in node.clauses:
        child = raw if not isinstance(raw, _SNode) else _compile(raw)
        if isinstance(child, TermQuery):
            {"must": must, "should": should,
             "must_not": must_not}[occur].append(child.term)
        elif isinstance(child, _MultiLeaf):
            if occur == "must":
                # required multi-term clause: a single-clause required
                # child (the classic parser's must_groups shape)
                children.append(("must", BooleanQuery(
                    multi=((child.kind, child.pattern, child.arg,
                            "should"),)
                )))
            else:
                multi.append((child.kind, child.pattern, child.arg, occur))
        else:
            children.append((occur, child))
    base = BooleanQuery(
        must=tuple(must), should=tuple(should), must_not=tuple(must_not),
        multi=tuple(multi),
    )
    if not children:
        return base
    return NestedQuery(base=base, children=tuple(children))
