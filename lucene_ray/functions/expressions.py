"""Scoring expressions compiled over doc values and the relevance score.

Reference analogue: the ``lucene/expressions`` module —
``JavascriptCompiler`` compiles an arithmetic source string into an
``Expression`` whose variables bind to doc values or ``_score``
(expressions/src/java/org/apache/lucene/expressions/js/
JavascriptCompiler.java, ``Expression.java``, used through
``FunctionScoreQuery`` / ``ExpressionValueSource``). Same surface here:
:func:`compile_expression` parses the grammar subset below into an AST
evaluated VECTORIZED over numpy arrays (one evaluation per candidate
batch, not per doc), and :func:`score_expression` reranks a query's
matches by the expression with ``_score`` bound to the BM25 score and
every other free variable bound to a numeric doc-values field.

Grammar (the commonly-used JavascriptCompiler subset):

    expr   := term (('+'|'-') term)*
    term   := factor (('*'|'/') factor)*
    factor := '-' factor | atom
    atom   := NUMBER | IDENT | IDENT '(' expr (',' expr)* ')' | '(' expr ')'

Functions: ln, log10, sqrt, abs, min, max, pow. Left-associative, float64
throughout — an oracle can mirror the exact op order in SQL.
"""

from __future__ import annotations

import re
from typing import Dict, List, Set, Tuple

import numpy as np

_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op>[-+*/(),]))"
)

_FUNCS = {
    "ln": (1, np.log),
    "log10": (1, np.log10),
    "sqrt": (1, np.sqrt),
    "abs": (1, np.abs),
    "min": (2, np.minimum),
    "max": (2, np.maximum),
    "pow": (2, np.power),
}


class Expression:
    """Compiled expression: ``variables`` are the free identifiers;
    ``evaluate`` binds each to a float64 array (or scalar) and returns
    the float64 result array."""

    def __init__(self, source: str, ast, variables: Set[str]):
        self.source = source
        self._ast = ast
        self.variables = variables

    def evaluate(self, bindings: Dict[str, np.ndarray]) -> np.ndarray:
        missing = self.variables - set(bindings)
        if missing:
            raise KeyError(f"unbound expression variables: {sorted(missing)}")
        return self._eval(self._ast, bindings)

    def _eval(self, node, env):
        kind = node[0]
        if kind == "num":
            return node[1]
        if kind == "var":
            return np.asarray(env[node[1]], dtype=np.float64)
        if kind == "neg":
            return -self._eval(node[1], env)
        if kind == "call":
            fn = _FUNCS[node[1]][1]
            return fn(*(self._eval(a, env) for a in node[2]))
        a = self._eval(node[1], env)
        b = self._eval(node[2], env)
        if kind == "+":
            return a + b
        if kind == "-":
            return a - b
        if kind == "*":
            return a * b
        return a / b


def _tokenize(src: str) -> List[Tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if m is None or m.end() == pos:
            if src[pos:].strip():
                raise ValueError(
                    f"bad character in expression at {src[pos:]!r}"
                )
            break
        pos = m.end()
        for g in ("num", "ident", "op"):
            v = m.group(g)
            if v is not None:
                out.append((g, v))
                break
    return out


def compile_expression(source: str) -> Expression:
    toks = _tokenize(source)
    variables: Set[str] = set()
    i = 0

    def peek():
        return toks[i] if i < len(toks) else (None, None)

    def take(expected=None):
        nonlocal i
        if i >= len(toks):
            raise ValueError(f"unexpected end of expression {source!r}")
        t = toks[i]
        if expected is not None and t[1] != expected:
            raise ValueError(f"expected {expected!r} at {t[1]!r}")
        i += 1
        return t

    def parse_expr():
        node = parse_term()
        while peek()[1] in ("+", "-"):
            op = take()[1]
            node = (op, node, parse_term())
        return node

    def parse_term():
        node = parse_factor()
        while peek()[1] in ("*", "/"):
            op = take()[1]
            node = (op, node, parse_factor())
        return node

    def parse_factor():
        if peek()[1] == "-":
            take()
            return ("neg", parse_factor())
        return parse_atom()

    def parse_atom():
        kind, val = take()
        if kind == "num":
            return ("num", float(val))
        if kind == "ident":
            if peek()[1] == "(":
                take("(")
                args = [parse_expr()]
                while peek()[1] == ",":
                    take(",")
                    args.append(parse_expr())
                take(")")
                if val not in _FUNCS:
                    raise ValueError(f"unknown function {val!r}")
                if len(args) != _FUNCS[val][0]:
                    raise ValueError(
                        f"{val}() takes {_FUNCS[val][0]} args, "
                        f"got {len(args)}"
                    )
                return ("call", val, args)
            variables.add(val)
            return ("var", val)
        if val == "(":
            node = parse_expr()
            take(")")
            return node
        raise ValueError(f"unexpected token {val!r} in {source!r}")

    ast = parse_expr()
    if i != len(toks):
        raise ValueError(f"trailing tokens after expression: {toks[i:]}")
    return Expression(source, ast, variables)


def score_expression(reader, query, source: str, k: int = 10):
    """Rerank ``query``'s full candidate set by the compiled expression —
    FunctionScoreQuery(ExpressionValueSource) semantics: ``_score`` binds
    to the BM25 score, every other variable to a numeric doc-values
    field; top-k under (expr desc, doc asc)."""
    from .query import _exhaustive_candidates, _topk_from

    expr = compile_expression(source)
    r = _exhaustive_candidates(reader, query)
    if r is None:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    cand, acc, _ = r
    if len(cand) == 0:
        return cand, acc.astype(np.float64)
    env: Dict[str, np.ndarray] = {}
    for var in expr.variables:
        if var == "_score":
            env[var] = acc.astype(np.float64)
        else:
            env[var] = np.asarray(
                reader.doc_values_for(var, cand), dtype=np.float64
            )
    vals = np.broadcast_to(
        np.asarray(expr.evaluate(env), dtype=np.float64), cand.shape
    )
    return _topk_from(cand, vals, k)
