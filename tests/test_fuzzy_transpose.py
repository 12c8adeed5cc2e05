"""FuzzyQuery transpositions=true — the reference default
(core/.../search/FuzzyQuery.java:61-76): Damerau-Levenshtein expansion.

The engine's damerau_within is the FULL (Lowrance-Wagner) variant,
matching DuckDB's damerau_levenshtein bit-for-bit (documented deviation
from the reference's OSA-restricted parametric automaton — they differ
only when an edit lands between transposed characters, e.g. ca->abc).
"""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pytest

from lucene_ray.functions.multiterm import (
    damerau_within,
    expand,
    levenshtein_within,
)
from lucene_ray.functions.query import BooleanQuery, score_blockmax, score_exhaustive
from lucene_ray.pipelines.build import IndexConfig

from test_engine_oracle import build_from_lists

VOCAB = sorted(
    "scan column window order sort part agg value line key join merge "
    "query group vector hash slow stream filter fast spark batch table "
    "small data big customer row dup".split()
)


def test_transposition_is_one_edit():
    assert damerau_within(VOCAB, "dtaa", 1) == ["data"]
    assert damerau_within(VOCAB, "straem", 1) == ["stream"]
    assert damerau_within(VOCAB, "windwo", 1) == ["window"]
    # plain Levenshtein needs 2 edits for the same typos
    assert levenshtein_within(VOCAB, "dtaa", 1) == []
    assert levenshtein_within(VOCAB, "straem", 1) == []


def test_full_dl_vs_osa_case():
    # the canonical full-DL-vs-OSA divergence: ca -> abc is 2 full edits
    # (transpose, then insert BETWEEN); OSA says 3
    assert damerau_within(["abc"], "ca", 2) == ["abc"]


def test_levenshtein_subset_of_damerau():
    rng = random.Random(7)
    alpha = "abcd"
    for _ in range(200):
        q = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
        cands = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 7)))
            for _ in range(25)
        ]
        for k in (1, 2):
            assert set(levenshtein_within(cands, q, k)) <= set(
                damerau_within(cands, q, k)
            )


def test_fuzz_vs_duckdb():
    con = duckdb.connect()
    rng = random.Random(42)
    alpha = "abc"
    for _ in range(800):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 6)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 7)))
        for k in (1, 2):
            want = (
                con.execute(
                    "SELECT damerau_levenshtein(?, ?)", [b, a]
                ).fetchone()[0]
                <= k
            )
            assert (b in damerau_within([b], a, k)) == want, (a, b, k)


def test_expand_kind_dfuzzy():
    got = expand("dfuzzy", "quey", 2, VOCAB)
    assert got == ["key", "query"]
    assert expand("dfuzzy", "data", 0, VOCAB) == ["data"]


def test_dfuzzy_clause_end_to_end(ray_session, tmp_path):
    docs = [
        "data stream merge",
        "window scan data",
        "key value table",
        "stream stream stream",
    ]
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2
    )
    build_from_lists(tmp_path, list(range(len(docs))), docs, cfg)
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(str(tmp_path))
    q = BooleanQuery(multi=(("dfuzzy", "straem", 1, "should"),))
    d1, s1 = score_blockmax(reader, q, 10)
    d2, s2 = score_exhaustive(reader, q, 10)
    assert d1.tolist() == d2.tolist() == [3, 0]
    np.testing.assert_array_equal(s1, s2)
    # must-role group: requires >= 1 expansion match
    qm = BooleanQuery(
        must=("data",), multi=(("dfuzzy", "windwo", 1, "must"),)
    )
    dm, _ = score_blockmax(reader, qm, 10)
    assert dm.tolist() == [1]
