"""Suggest-module analogues: spell correction and prefix completion.

Reference: the suggest module —
``suggest/src/java/org/apache/lucene/search/spell/DirectSpellChecker.java``
(vocabulary-driven fuzzy suggestions straight off the term dictionary, no
sidecar index) and
``suggest/src/java/org/apache/lucene/search/suggest/fst/WFSTCompletionLookup.java``
(weight-ordered prefix completion).

Semantics implemented here, documented precisely so the DuckDB oracle can
mirror them:

* ``spell_suggest``: for each input word, candidate terms at plain
  Levenshtein distance 1..max_edits (the input itself is never suggested),
  with doc_freq >= min_df, ranked (distance asc, doc_freq desc, term asc),
  top-k per input. This is DirectSpellChecker in SUGGEST_ALWAYS mode with
  ``comparator = by score then docFreq``; our "score" is the raw edit
  distance (the reference divides by length — a monotone per-pair rescale
  that cannot reorder same-input candidates at distance 1 vs 2, but CAN
  reorder same-distance candidates of different lengths; we keep raw
  distance so DuckDB's ``editdist3`` — plain Levenshtein, no
  transpositions, matching FuzzyQuery(transpositions=false) — is an exact
  oracle).
* ``complete_prefix``: for each prefix, terms starting with it ranked
  (doc_freq desc, term asc), top-k — WFSTCompletionLookup's
  weight-then-key ordering with doc_freq as the weight.

Scale shape: both run off the :func:`~lucene_ray.pipelines.stats.term_stats`
aggregation (one pre-combined shuffle of O(vocab x batches) rows). The
per-batch matcher emits only matching candidates — a tiny trickle — so the
final per-input top-k groupby moves almost nothing. The Levenshtein filter
is the vectorized column-DP from functions/multiterm.py (whole batch
stacked, one DP sweep per input word), not a per-term Python loop.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.multiterm import levenshtein_within
from .build import IndexConfig
from .stats import term_stats


def _suggest_matcher(words: Sequence[str], max_edits: int, min_df: int,
                     transpositions: bool = True):
    """Per-batch candidate matcher: (term, doc_freq) rows -> matching
    (query_id, term, dist, df) rows. Distance classes come from two
    vectorized within-k passes (<=1 over the <=max_edits survivors), so no
    per-term scalar DP runs."""
    lowered = [w.lower() for w in words]

    def match(batch: pa.Table) -> pa.Table:
        from ..functions.multiterm import damerau_within

        within = damerau_within if transpositions else levenshtein_within
        terms = batch.column("term").to_pylist()
        dfs = batch.column("doc_freq").to_numpy(zero_copy_only=False)
        idx = {t: i for i, t in enumerate(terms)}
        qid_out: List[int] = []
        term_out: List[str] = []
        dist_out: List[int] = []
        df_out: List[int] = []
        for qid, w in enumerate(lowered):
            hits = within(terms, w, max_edits)
            near = set(within(hits, w, 1)) if max_edits > 1 else set(hits)
            for t in hits:
                if t == w:
                    continue  # never suggest the input itself
                df_v = int(dfs[idx[t]])
                if df_v < min_df:
                    continue
                qid_out.append(qid)
                term_out.append(t)
                dist_out.append(1 if t in near else max_edits)
                df_out.append(df_v)
        return pa.table(
            {
                "query_id": pa.array(qid_out, pa.int32()),
                "term": pa.array(term_out, pa.string()),
                "dist": pa.array(dist_out, pa.int32()),
                "df": pa.array(df_out, pa.int64()),
            }
        )

    return match


def _topk_spell(k: int):
    # (dist asc, df desc, term asc); term ties break via np.lexsort on
    # the string column (ascending)
    def topk(group: pa.Table) -> pa.Table:
        terms = group.column("term").to_numpy(zero_copy_only=False)
        dfs = group.column("df").to_numpy(zero_copy_only=False)
        dist = group.column("dist").to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -dfs, dist))[:k]
        out = group.take(pa.array(order))
        return pa.table(
            {
                "query_id": out.column("query_id"),
                "rank": pa.array(np.arange(1, len(out) + 1, dtype=np.int32)),
                "term": out.column("term"),
                "dist": out.column("dist"),
                "df": out.column("df"),
            }
        )

    return topk


def spell_suggest(
    ds: "ray.data.Dataset",
    words: Sequence[str],
    max_edits: int = 2,
    k: int = 5,
    min_df: int = 1,
    transpositions: bool = True,
    cfg: Optional[IndexConfig] = None,
) -> "ray.data.Dataset":
    """Dataset(text rows) + misspelled words -> per-word ranked suggestions
    (query_id, rank, term, dist, df).

    ``transpositions=True`` (default) counts an adjacent swap as ONE edit
    — the reference DirectSpellChecker hardcodes transpositions=true in
    its candidate enum (suggest/.../spell/DirectSpellChecker.java:424-425
    ``new FuzzyTermsEnum(..., true)``); full-DL variant note as in
    :func:`lucene_ray.functions.multiterm.damerau_within`. Deviation
    (documented): no minPrefix constraint — the reference requires
    max(minPrefix, editDistance-1) exact leading chars per candidate."""
    if max_edits not in (1, 2):
        raise ValueError("max_edits must be 1 or 2 (FuzzyQuery's bound)")
    stats = term_stats(ds, cfg)
    cands = stats.map_batches(
        _suggest_matcher(words, max_edits, min_df, transpositions),
        batch_format="pyarrow",
    )
    return cands.groupby("query_id").map_groups(
        _topk_spell(k), batch_format="pyarrow"
    )


def _prefix_matcher(prefixes: Sequence[str]):
    lowered = [p.lower() for p in prefixes]

    def match(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for qid, p in enumerate(lowered):
            hit = batch.filter(pc.starts_with(batch.column("term"), p))
            parts.append(
                pa.table(
                    {
                        "query_id": pa.array([qid] * len(hit), pa.int32()),
                        "term": hit.column("term"),
                        "df": hit.column("doc_freq").cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return match


def _topk_prefix(k: int):
    # (df desc, term asc) — Arrow-native lexsort, no pandas round-trip
    def topk(group: pa.Table) -> pa.Table:
        terms = group.column("term").to_numpy(zero_copy_only=False)
        dfs = group.column("df").to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -dfs))[:k]
        out = group.take(pa.array(order))
        return pa.table(
            {
                "query_id": out.column("query_id"),
                "rank": pa.array(np.arange(1, len(out) + 1, dtype=np.int32)),
                "term": out.column("term"),
                "df": out.column("df"),
            }
        )

    return topk


def complete_prefix(
    ds: "ray.data.Dataset",
    prefixes: Sequence[str],
    k: int = 5,
    cfg: Optional[IndexConfig] = None,
) -> "ray.data.Dataset":
    """Dataset(text rows) + prefixes -> per-prefix weight-ordered
    completions (query_id, rank, term, df)."""
    stats = term_stats(ds, cfg)
    cands = stats.map_batches(_prefix_matcher(prefixes), batch_format="pyarrow")
    return cands.groupby("query_id").map_groups(
        _topk_prefix(k), batch_format="pyarrow"
    )


def _fuzzy_complete_matcher(
    prefixes: Sequence[str], max_edits: int, non_fuzzy_prefix: int,
    min_fuzzy_length: int, min_df: int, transpositions: bool = True,
):
    lowered = [p.lower() for p in prefixes]

    def match(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.multiterm import (
            prefix_damerau_distance,
            prefix_edit_distance,
        )

        dist_fn = (
            prefix_damerau_distance if transpositions else
            prefix_edit_distance
        )

        parts = []
        dfs = batch.column("doc_freq").cast(pa.int64())
        keep_df = pc.greater_equal(dfs, min_df)
        batch_f = batch.filter(keep_df)
        terms = batch_f.column("term").to_pylist()
        df_np = batch_f.column("doc_freq").cast(pa.int64()).to_numpy()
        for qid, p in enumerate(lowered):
            if len(p) < min_fuzzy_length:
                dist = {
                    t: 0 for t in terms if t.startswith(p)
                }  # too short to fuzz: exact prefix only
            else:
                head = p[:non_fuzzy_prefix]
                cands = [t for t in terms if t.startswith(head)]
                dist = dist_fn(cands, p, max_edits)
            if not dist:
                continue
            idx = [i for i, t in enumerate(terms) if t in dist]
            parts.append(
                pa.table(
                    {
                        "query_id": pa.array([qid] * len(idx), pa.int32()),
                        "term": pa.array([terms[i] for i in idx]),
                        "df": pa.array(df_np[idx], pa.int64()),
                        "dist": pa.array(
                            [dist[terms[i]] for i in idx], pa.int32()
                        ),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int32()),
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int32()),
                }
            )
        return pa.concat_tables(parts)

    return match


def _topk_fuzzy(k: int):
    # (dist asc, df desc, term asc) — Arrow-native
    def topk(group: pa.Table) -> pa.Table:
        terms = group.column("term").to_numpy(zero_copy_only=False)
        dfs = group.column("df").to_numpy(zero_copy_only=False)
        dist = group.column("dist").to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -dfs, dist))[:k]
        out = group.take(pa.array(order))
        return pa.table(
            {
                "query_id": out.column("query_id"),
                "rank": pa.array(np.arange(1, len(out) + 1, dtype=np.int32)),
                "term": out.column("term"),
                "df": out.column("df"),
                "dist": out.column("dist"),
            }
        )

    return topk


def complete_fuzzy(
    ds: "ray.data.Dataset",
    prefixes: Sequence[str],
    k: int = 5,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
    min_df: int = 1,
    transpositions: bool = True,
    cfg: Optional[IndexConfig] = None,
) -> "ray.data.Dataset":
    """FuzzySuggester analogue (reference:
    suggest/.../analyzing/AnalyzingSuggester.java +
    FuzzySuggester.java): a completion matches when some PREFIX of it is
    within ``max_edits`` edits of the typed prefix, with the reference's
    defaults-shaped knobs — ``transpositions=True`` (the reference's
    DEFAULT_TRANSPOSITIONS) counts an adjacent swap as ONE edit via the
    full Damerau-Levenshtein metric (the unrestricted variant DuckDB
    reproduces; the reference automaton is the OSA restriction — same
    documented deviation as FuzzyQuery); pass False for classic
    Levenshtein, as the reference's constructor allows. The first
    ``non_fuzzy_prefix`` chars must match exactly, and inputs shorter
    than ``min_fuzzy_length`` complete exact-only. Ranked
    (prefix-distance asc, df desc, term asc) — the reference ranks by
    weight alone over the fuzzed set; we surface the distance as the
    primary key so exact completions always precede fuzzed ones
    (documented deviation, mirrored by the SQL oracle).

    -> Dataset(query_id, rank, term, df, dist)."""
    stats = term_stats(ds, cfg)
    cands = stats.map_batches(
        _fuzzy_complete_matcher(
            prefixes, max_edits, non_fuzzy_prefix, min_fuzzy_length,
            min_df, transpositions,
        ),
        batch_format="pyarrow",
    )
    return cands.groupby("query_id").map_groups(
        _topk_fuzzy(k), batch_format="pyarrow"
    )


def _infix_matcher(substrings: Sequence[str]):
    lowered = [s.lower() for s in substrings]

    def match(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for qid, s in enumerate(lowered):
            hit = batch.filter(pc.match_substring(batch.column("term"), s))
            parts.append(
                pa.table(
                    {
                        "query_id": pa.array([qid] * len(hit), pa.int32()),
                        "term": hit.column("term"),
                        "df": hit.column("doc_freq").cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return match


def complete_infix(
    ds: "ray.data.Dataset",
    substrings: Sequence[str],
    k: int = 5,
    cfg: Optional[IndexConfig] = None,
) -> "ray.data.Dataset":
    """Infix completion (reference: suggest/.../analyzing/
    AnalyzingInfixSuggester.java — suggestions matched anywhere in the
    text, ranked by weight): terms CONTAINING the query substring, ranked
    (doc_freq desc, term asc), top-k per input. Our suggestion corpus is
    the vocabulary, so token-start matching degenerates to substring
    matching (single-token suggestions). Same term_stats-driven shape as
    complete_prefix: the matcher emits only hits, the top-k groupby moves
    a trickle."""
    stats = term_stats(ds, cfg)
    cands = stats.map_batches(
        _infix_matcher(substrings), batch_format="pyarrow"
    )
    return cands.groupby("query_id").map_groups(
        _topk_prefix(k), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# FreeTextSuggester analogue: n-gram LM completion with stupid backoff
# ---------------------------------------------------------------------------

#: stupid-backoff constant (FreeTextSuggester.java:126)
FREETEXT_ALPHA = 0.4


def _bigram_counts(ds: "ray.data.Dataset", cfg: Optional[IndexConfig]):
    """(w1, w2) -> count over the analyzed token stream (adjacent KEPT
    terms; stopword gaps collapse, like the suggester's analyzed ngrams).
    Distributed shape: per-batch partial Counter -> one bounded groupby
    (ngram space is pruned by min_count at lookup; the reference prunes
    with minFreq at build)."""
    from collections import Counter

    from ..functions.analysis import make_analyzer

    analyzer = make_analyzer((cfg or IndexConfig()).analyzer)

    def partial(batch: pa.Table) -> pa.Table:
        c: "Counter[tuple]" = Counter()
        for t in batch.column("text").to_pylist():
            toks = analyzer.analyze(t or "")
            c.update(zip(toks, toks[1:]))
        if not c:
            return pa.table(
                {"w1": pa.array([], pa.string()),
                 "w2": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        ks = sorted(c)
        return pa.table(
            {
                "w1": pa.array([k[0] for k in ks], pa.string()),
                "w2": pa.array([k[1] for k in ks], pa.string()),
                "cnt": pa.array([c[k] for k in ks], pa.int64()),
            }
        )

    import ray.data as rd

    return (
        ds.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(rd.aggregate.Sum("cnt", alias_name="count"))
    )


def freetext_suggest(
    ds: "ray.data.Dataset",
    inputs: Sequence[Tuple[str, str]],
    k: int = 5,
    cfg: Optional[IndexConfig] = None,
) -> pa.Table:
    """FreeTextSuggester analogue (suggest/analyzing/FreeTextSuggester
    .java:93-126, word-bigram order with stupid backoff): for each
    (context_word, typed_prefix) input, candidate completions are terms
    starting with the prefix, scored ``count(context, cand) /
    count(context .)`` when the bigram exists, else ``ALPHA *
    count(cand) / total_tokens`` — ranked (score desc, term asc), top-k.

    -> Arrow table (query_id, rank, term, score). Scale shape: the
    bigram model stays IN-PLAN — only rows whose context word is among
    the inputs' contexts (and prefix-matched unigrams) are gathered, so
    the driver pull is bounded by the input set, never the model; the
    corpus-total token count is a Dataset aggregate."""
    import pyarrow.compute as pc

    from ..functions.rounding import round_half_away
    from .stats import term_stats

    ctxs = sorted({c.lower() for c, _ in inputs})
    prefixes = sorted({p.lower() for _, p in inputs})

    def keep_ctx(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("w1"),
                                     value_set=pa.array(ctxs)))

    bigrams = (
        _bigram_counts(ds, cfg)
        .map_batches(keep_ctx, batch_format="pyarrow")
        .take_all()
    )
    stats = term_stats(ds, cfg)
    total = int(stats.sum("total_tf"))

    def keep_prefix(batch: pa.Table) -> pa.Table:
        m = None
        for p in prefixes:
            cur = pc.starts_with(batch.column("term"), p)
            m = cur if m is None else pc.or_(m, cur)
        return batch.filter(m)

    uni = {
        r["term"]: int(r["total_tf"])
        for r in stats.map_batches(
            keep_prefix, batch_format="pyarrow"
        ).take_all()
    }
    by_ctx: Dict[str, Dict[str, int]] = {}
    for r in bigrams:
        by_ctx.setdefault(r["w1"], {})[r["w2"]] = int(r["count"])
    qids, ranks, terms_out, scores = [], [], [], []
    for qid, (ctx, prefix) in enumerate(inputs):
        ctx = ctx.lower()
        prefix = prefix.lower()
        ctx_counts = by_ctx.get(ctx, {})
        ctx_total = sum(ctx_counts.values())
        cands = {}
        for w2, c in ctx_counts.items():
            if w2.startswith(prefix):
                cands[w2] = c / ctx_total
        if not cands:  # backoff to the unigram model, scaled by ALPHA
            for t, c in uni.items():
                if t.startswith(prefix):
                    cands[t] = FREETEXT_ALPHA * (c / total)
        top = sorted(cands.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for r_i, (t, s) in enumerate(top, 1):
            qids.append(qid)
            ranks.append(r_i)
            terms_out.append(t)
            scores.append(float(round_half_away(np.asarray([s]), 6)[0]))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "term": pa.array(terms_out, pa.string()),
            "score": pa.array(scores, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# WordBreakSpellChecker (round 4)
# ---------------------------------------------------------------------------


def suggest_word_breaks(
    reader,
    words: Sequence[str],
    k: int = 5,
    max_changes: int = 1,
    min_break_length: int = 1,
    min_suggestion_frequency: int = 1,
    sort_method: str = "max",
):
    """WordBreakSpellChecker.suggestWordBreaks analogue (reference:
    suggest/src/java/org/apache/lucene/search/spell/
    WordBreakSpellChecker.java:241-330): break a run-together word into
    in-dictionary parts. Each split point needs a left part with
    df >= min_suggestion_frequency (recursion continues on the right
    side gated on the LEFT part only, like the reference's phase 2);
    a complete suggestion needs every part valid. Scoring: number of
    breaks ascending, then the parts' max (or sum) df descending —
    BreakSuggestionSortMethod NUM_CHANGES_THEN_{MAX,SUM}_FREQUENCY;
    ties break on the joined suggestion text ascending (a deterministic
    refinement: the reference's priority queue leaves ties unordered).
    Deviation (documented): no maxEvaluations traversal cap — the cap
    is an evaluation-order-dependent perf guard, not semantics; the
    exhaustive enumeration is deterministic and SQL-expressible.

    -> list of (input_word, [(suggestion, n_changes, freq), ...]) with
    suggestion the space-joined parts."""
    if sort_method not in ("max", "sum"):
        raise ValueError(f"unknown sort_method {sort_method!r}")
    min_len = max(1, int(min_break_length))
    out = []
    for w in words:
        found: list = []

        def rec(suffix: str, parts: tuple, freqs: tuple, breaks_left: int):
            n = len(suffix)
            if breaks_left <= 0 or n < 2 * min_len:
                return
            for i in range(min_len, n - min_len + 1):
                left, right = suffix[:i], suffix[i:]
                df_l = reader.term_stats(left)[0]
                if df_l < min_suggestion_frequency:
                    continue
                df_r = reader.term_stats(right)[0]
                if df_r >= min_suggestion_frequency:
                    found.append(
                        (parts + (left, right), freqs + (df_l, df_r))
                    )
                rec(right, parts + (left,), freqs + (df_l,),
                    breaks_left - 1)

        rec(w, (), (), max(1, int(max_changes)))
        fold = max if sort_method == "max" else sum
        ranked = sorted(
            (
                (" ".join(p), len(p) - 1, int(fold(f)))
                for p, f in found
            ),
            key=lambda r: (r[1], -r[2], r[0]),
        )[: max(0, k)]
        out.append((w, ranked))
    return out


def suggest_word_combinations(
    reader,
    words: Sequence[str],
    k: int = 5,
    max_combine_length: int = 20,
    max_changes: int = 2,
    min_suggestion_frequency: int = 1,
    mode: str = "when_not_in_index",
):
    """WordBreakSpellChecker.suggestWordCombinations analogue
    (WordBreakSpellChecker.java:148-240): concatenate runs of up to
    ``max_changes`` ADJACENT query words into one dictionary word. Modes
    (spell/SuggestMode.java): ``always``; ``when_not_in_index`` keeps a
    combination only when some included word has df 0 (minFreq == 0);
    ``more_popular`` needs the combined df >= the included words' max
    df. Ranking: fewer combined words first, then combined df
    descending, then (start index, text) ascending (deterministic
    refinement of the reference's unordered queue ties).

    -> list of (combined_word, (orig_index_lo, orig_index_hi), df)."""
    if mode not in ("always", "when_not_in_index", "more_popular"):
        raise ValueError(f"unknown mode {mode!r}")
    dfs = [reader.term_stats(w)[0] for w in words]
    cands = []
    for i in range(len(words) - 1):
        if len(words[i]) > max_combine_length:
            continue
        combined = words[i]
        mx, mn = dfs[i], dfs[i]
        for j in range(i + 1, min(len(words), i + max_changes + 1)):
            combined += words[j]
            if len(combined) > max_combine_length:
                break
            mx, mn = max(mx, dfs[j]), min(mn, dfs[j])
            df_c = reader.term_stats(combined)[0]
            if mode == "more_popular" and df_c < mx:
                continue
            if mode == "when_not_in_index" and mn != 0:
                continue
            if df_c >= min_suggestion_frequency:
                cands.append((combined, (i, j), df_c, j - i))
    cands.sort(key=lambda c: (c[3], -c[2], c[1][0], c[0]))
    return [(c[0], c[1], c[2]) for c in cands[: max(0, k)]]


def complete_prefix_context(
    ds: "ray.data.Dataset",
    queries: Sequence,  # [(prefix, context_value), ...]
    context_col: str = "lang",
    k: int = 5,
    cfg: Optional[IndexConfig] = None,
) -> "ray.data.Dataset":
    """Context-filtered completion — ContextSuggestField + ContextQuery
    analogue (reference: suggest/src/java/org/apache/lucene/search/
    suggest/document/ContextSuggestField.java, ContextQuery.java: each
    suggestion carries contexts and a lookup filters to the query's
    context before ranking). Completions are drawn only from docs whose
    ``context_col`` equals the query's context, ranked
    (df-within-context desc, term asc) like :func:`complete_prefix`.

    Plan: one streaming analyzer pass emits per-batch PRE-AGGREGATED
    (context, term, df_part) rows (distinct terms per doc — df not tf);
    a bounded groupby((context, term)) sums; per-query prefix+context
    filters and the shared top-k group kernel finish.
    -> Dataset(query_id, rank, term, df)."""
    import ray.data
    from ray.data.aggregate import Sum

    from ..functions.analysis import make_analyzer

    cfg = cfg or IndexConfig()
    analyzer_name = cfg.analyzer
    lowered = [(str(p).lower(), c) for p, c in queries]

    def partial(batch: pa.Table) -> pa.Table:
        an = make_analyzer(analyzer_name)
        ctxs = batch.column(context_col).to_pylist()
        texts = batch.column(cfg.text_col).to_pylist()
        agg: dict = {}
        for ctx, text in zip(ctxs, texts):
            for t in set(an.analyze(text or "")):
                key = (ctx, t)
                agg[key] = agg.get(key, 0) + 1
        if not agg:
            return pa.table(
                {"ctx": pa.array([], pa.string()),
                 "term": pa.array([], pa.string()),
                 "df_part": pa.array([], pa.int64())}
            )
        keys = sorted(agg)
        return pa.table(
            {
                "ctx": pa.array([c for c, _ in keys], pa.string()),
                "term": pa.array([t for _, t in keys], pa.string()),
                "df_part": pa.array([agg[k2] for k2 in keys], pa.int64()),
            }
        )

    stats = (
        ds.select_columns([cfg.text_col, context_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["ctx", "term"])
        .aggregate(Sum("df_part", alias_name="df"))
    )

    def match(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for qid, (p, c) in enumerate(lowered):
            hit = batch.filter(
                pc.and_(
                    pc.starts_with(batch.column("term"), p),
                    pc.equal(batch.column("ctx"), c),
                )
            )
            parts.append(
                pa.table(
                    {
                        "query_id": pa.array([qid] * len(hit), pa.int32()),
                        "term": hit.column("term"),
                        "df": hit.column("df").cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return (
        stats.map_batches(match, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_topk_prefix(k), batch_format="pyarrow")
    )
