"""Scoring expressions (lucene/expressions JavascriptCompiler analogue).

Reference: expressions/src/java/org/apache/lucene/expressions/js/
JavascriptCompiler.java + Expression.java, bound through
FunctionScoreQuery. Parser/eval checked against direct numpy math;
score_expression checked against brute-force recomputation over the
exhaustive candidate set and against score_boost_by_field for the
linear-boost special case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.expressions import (
    compile_expression,
    score_expression,
)

TEXTS = [
    "alpha beta gamma",
    "alpha beta",
    "gamma delta",
    "alpha delta delta",
    "beta gamma gamma",
    "alpha",
    "delta beta",
    "gamma alpha beta",
]
VALS = [50, 10, 70, 30, 70, 20, 60, 40]


@pytest.fixture()
def expr_index(ray_session, tmp_path):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.state.docvalues import write_doc_values

    out = str(tmp_path / "idx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "ts": pa.array(VALS, pa.int64()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(TEXTS))
    write_doc_values(
        ray.data.from_arrow(docs.select(["doc_id", "ts"])), out, "ts"
    )
    return out


def _reader(index_dir):
    from lucene_ray.pipelines.search import get_reader

    return get_reader(index_dir)


# ---------------------------------------------------------------- parser


def test_precedence_and_associativity():
    e = compile_expression("1 + 2 * 3 - 4 / 2")
    assert e.evaluate({}) == 1 + 2 * 3 - 4 / 2
    # left-associative subtraction/division
    assert compile_expression("8 - 3 - 2").evaluate({}) == 3
    assert compile_expression("16 / 4 / 2").evaluate({}) == 2
    assert compile_expression("(1 + 2) * 3").evaluate({}) == 9


def test_unary_minus_and_scientific():
    assert compile_expression("-3 + 5").evaluate({}) == 2
    assert compile_expression("--2").evaluate({}) == 2
    assert compile_expression("2e3 + 1.5E-1").evaluate({}) == 2000.15
    assert compile_expression("-x * 2").evaluate({"x": 4.0}) == -8


def test_functions_match_numpy():
    arr = np.array([0.5, 1.0, 4.0, 9.0])
    cases = {
        "ln(x)": np.log(arr),
        "log10(x)": np.log10(arr),
        "sqrt(x)": np.sqrt(arr),
        "abs(0 - x)": np.abs(-arr),
        "min(x, 2)": np.minimum(arr, 2.0),
        "max(x, 2)": np.maximum(arr, 2.0),
        "pow(x, 2)": arr**2,
    }
    for src, expect in cases.items():
        got = compile_expression(src).evaluate({"x": arr})
        np.testing.assert_allclose(got, expect)


def test_variables_collected_and_required():
    e = compile_expression("_score + 0.1 * ln(1 + ts)")
    assert e.variables == {"_score", "ts"}
    with pytest.raises(KeyError):
        e.evaluate({"_score": np.ones(3)})


def test_parse_errors():
    for bad in ("1 +", "foo(1)", "min(1)", "pow(1,2,3)", "(1 + 2",
                "1 2", "a @ b", ""):
        with pytest.raises(ValueError):
            compile_expression(bad)


def test_float64_op_order_is_sql_mirrorable():
    # evaluation is plain float64 with the source's op order, so a SQL
    # engine computing the same tree bit-matches
    e = compile_expression("a / 3 + b / 7")
    a, b = np.float64(1.0), np.float64(2.0)
    assert e.evaluate({"a": a, "b": b}) == a / 3 + b / 7


# ------------------------------------------------------------ integration


def test_score_identity_expression_matches_exhaustive(expr_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_exhaustive

    an = make_analyzer("en_nostem_simple")
    r = _reader(expr_index)
    for qs in ("alpha beta", "+gamma -delta", "delta"):
        q = parse_query(qs, an)
        ed, es = score_exhaustive(r, q, 10)
        xd, xs = score_expression(r, q, "_score", k=10)
        assert xd.tolist() == ed.tolist()
        np.testing.assert_allclose(xs, es)


def test_expression_equals_boost_by_field(expr_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        parse_query,
        score_boost_by_field,
    )

    an = make_analyzer("en_nostem_simple")
    r = _reader(expr_index)
    q = parse_query("alpha gamma", an)
    bd, bs = score_boost_by_field(
        r, q, "ts", weight=0.05, scale=10.0, offset=20, k=10
    )
    xd, xs = score_expression(
        r, q, "_score + 0.05 * ((ts - 20) / 10)", k=10
    )
    assert xd.tolist() == bd.tolist()
    np.testing.assert_allclose(xs, bs)


def test_nonlinear_expression_vs_brute_force(expr_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_exhaustive

    an = make_analyzer("en_nostem_simple")
    r = _reader(expr_index)
    q = parse_query("alpha beta gamma delta", an)  # matches every doc
    docs, scores = score_exhaustive(r, q, len(TEXTS))
    bm25 = dict(zip(docs.tolist(), scores.tolist()))
    src = "_score + 0.2 * ln(1 + max(ts - 30, 0)) - sqrt(ts) / 100"

    def brute(d):
        ts = float(VALS[d])
        return (bm25[d] + 0.2 * np.log(1 + max(ts - 30, 0.0))
                - np.sqrt(ts) / 100)

    ref = sorted(bm25, key=lambda d: (-brute(d), d))
    xd, xs = score_expression(r, q, src, k=5)
    assert xd.tolist() == ref[:5]
    np.testing.assert_allclose(xs, [brute(d) for d in ref[:5]])


def test_expression_respects_deletes(expr_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query
    from lucene_ray.state.deletes import delete_docs

    delete_docs(expr_index, [2, 4])
    an = make_analyzer("en_nostem_simple")
    r = _reader(expr_index)
    xd, _ = score_expression(
        r, parse_query("gamma", an), "_score + ts / 1000", k=10
    )
    assert 2 not in xd.tolist() and 4 not in xd.tolist()


def test_constant_expression_ties_break_by_doc(expr_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query

    an = make_analyzer("en_nostem_simple")
    r = _reader(expr_index)
    xd, xs = score_expression(r, parse_query("beta", an), "7", k=10)
    assert xd.tolist() == sorted(xd.tolist())
    assert all(s == 7.0 for s in xs)
