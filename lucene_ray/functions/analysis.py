"""Analysis chains: composition of tokenize -> possessive -> lowercase ->
stopword -> Porter stem, mirroring the reference's English chain
(reference: analysis/common/src/java/org/apache/lucene/analysis/en/
EnglishAnalyzer.java:102-110: StandardTokenizer | EnglishPossessiveFilter |
LowerCaseFilter | StopFilter | PorterStemFilter).

Analyzers are plain callables-with-state; the indexing stage instantiates one
per Ray actor (setup once per worker, work per batch) and memoizes the
per-token filter chain in a dict so the Zipf head of the vocabulary is
processed once.

Two built-in analyzers:

* ``standard_en`` — the reference-faithful chain above.
* ``simple`` — lowercase + ``[a-z0-9]+`` extraction; exists so that the
  DuckDB correctness oracle can express the exact same tokenization in ANSI
  SQL (``regexp_extract_all(lower(text), '[a-z0-9]+')``).

Extension surface: register any object with ``analyze(text) -> list[str]``
via :func:`register_analyzer` (reference analogue: Analyzer/TokenFilter SPI,
core/src/java/org/apache/lucene/analysis/Analyzer.java).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional

from .porter import porter_stem
from .tokenize import tokenize

#: The reference's 33-word default English stop set
#: (analysis/common/.../en/EnglishAnalyzer.java:46-53).
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

_APOSTROPHES = ("'s", "’s", "＇s", "'S", "’S", "＇S")

# Java Character.toLowerCase is the *simple* (1:1 codepoint) case mapping;
# Python str.lower() applies full case mapping. The only common divergence is
# dotted capital I (U+0130) which full-maps to "i" + combining dot.
_SIMPLE_LOWER_OVERRIDES = {"İ": "i"}


def strip_possessive(token: str) -> str:
    """EnglishPossessiveFilter: drop a trailing ['’＇][sS] (2 chars)
    (reference: analysis/common/.../en/EnglishPossessiveFilter.java:33-50)."""
    if len(token) >= 2 and token.endswith(_APOSTROPHES):
        return token[:-2]
    return token


def lowercase(token: str) -> str:
    """Per-codepoint simple lowercase (LowerCaseFilter semantics, reference:
    core/.../analysis/LowerCaseFilter.java:36-43)."""
    if token.isascii():
        return token.lower()
    out = []
    for ch in token:
        low = _SIMPLE_LOWER_OVERRIDES.get(ch)
        if low is None:
            low = ch.lower()
            if len(low) > 1:  # full mapping expanded; keep 1:1 semantics
                low = low[0]
        out.append(low)
    return "".join(out)


class StandardEnglishAnalyzer:
    """tokenize -> possessive -> lowercase -> stop -> porter, memoized."""

    name = "standard_en"

    def __init__(self, stopwords: Optional[frozenset] = None, stem: bool = True):
        self.stopwords = ENGLISH_STOP_WORDS if stopwords is None else stopwords
        self.stem = stem
        # raw token -> final term, or None when the token is a stopword
        self._cache: Dict[str, Optional[str]] = {}

    def _term(self, raw: str) -> Optional[str]:
        cache = self._cache
        if raw in cache:
            return cache[raw]
        tok = lowercase(strip_possessive(raw))
        if tok in self.stopwords:
            term = None
        elif self.stem:
            term = porter_stem(tok)
        else:
            term = tok
        cache[raw] = term
        return term

    def analyze(self, text: str) -> List[str]:
        term = self._term
        return [t for t in (term(r) for r in tokenize(text)) if t is not None]

    def analyze_positions(self, text: str):
        """(terms, positions): position = the token's index in the RAW
        token stream, so dropped stopwords advance positions (StopFilter's
        position-increment semantics, core/.../analysis/StopFilter.java +
        FilteringTokenFilter.java:49-63)."""
        term = self._term
        terms: List[str] = []
        pos: List[int] = []
        for i, raw in enumerate(tokenize(text)):
            t = term(raw)
            if t is not None:
                terms.append(t)
                pos.append(i)
        return terms, pos

    def analyze_offsets(self, text: str):
        """(terms, positions, starts, ends): surface character offsets per
        kept term (OffsetAttribute semantics — offsets span the SURFACE
        token, not the normalized term; reference: analysis/
        tokenattributes/OffsetAttribute.java). Spans come from a running-
        cursor scan (tokens are in-order substrings; rare non-contiguous
        tokens — combining marks skipped mid-token — get (-1, -1))."""
        term = self._term
        terms: List[str] = []
        pos: List[int] = []
        starts: List[int] = []
        ends: List[int] = []
        cur = 0
        for i, raw in enumerate(tokenize(text)):
            j = text.find(raw, cur)
            if j >= 0:
                cur = j + len(raw)
            t = term(raw)
            if t is not None:
                terms.append(t)
                pos.append(i)
                starts.append(j)
                ends.append(-1 if j < 0 else j + len(raw))
        return terms, pos, starts, ends


class SimpleAnalyzer:
    """lower(text) then extract [a-z0-9]+ runs — SQL-parity analyzer."""

    name = "simple"
    _RE = re.compile(r"[a-z0-9]+")

    def analyze(self, text: str) -> List[str]:
        return self._RE.findall(text.lower())

    def analyze_positions(self, text: str):
        toks = self._RE.findall(text.lower())
        return toks, list(range(len(toks)))

    def analyze_offsets(self, text: str):
        """Spans via finditer over lower(text) — 1:1 with the original for
        length-preserving lowercase (ASCII corpora; length-changing
        Unicode lowercase would shift spans, documented limitation)."""
        terms, pos, starts, ends = [], [], [], []
        for i, m in enumerate(self._RE.finditer(text.lower())):
            terms.append(m.group())
            pos.append(i)
            starts.append(m.start())
            ends.append(m.end())
        return terms, pos, starts, ends


class SimpleStopAnalyzer(SimpleAnalyzer):
    """Simple tokens minus the reference's 33 English stopwords — the chain
    the DuckDB oracle can express verbatim in SQL:
    ``unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))`` filtered by
    ``NOT IN (stop list)``. Porter stemming is excluded because DuckDB's
    ``stem()`` lives in the (unavailable offline) fts extension — stem
    fidelity is pytest-verified against the brute-force oracle instead."""

    name = "en_nostem_simple"

    def analyze(self, text: str) -> List[str]:
        stop = ENGLISH_STOP_WORDS
        return [t for t in self._RE.findall(text.lower()) if t not in stop]

    def analyze_offsets(self, text: str):
        stop = ENGLISH_STOP_WORDS
        terms, pos, starts, ends = [], [], [], []
        for i, m in enumerate(self._RE.finditer(text.lower())):
            t = m.group()
            if t not in stop:
                terms.append(t)
                pos.append(i)
                starts.append(m.start())
                ends.append(m.end())
        return terms, pos, starts, ends

    def analyze_positions(self, text: str):
        stop = ENGLISH_STOP_WORDS
        terms: List[str] = []
        pos: List[int] = []
        for i, t in enumerate(self._RE.findall(text.lower())):
            if t not in stop:
                terms.append(t)
                pos.append(i)
        return terms, pos


class WhitespaceAnalyzer:
    """Split on whitespace, no normalization (reference:
    analysis/common/.../core/WhitespaceTokenizer.java)."""

    name = "whitespace"

    def analyze(self, text: str) -> List[str]:
        return text.split()


class KeywordAnalyzer:
    """Whole input as a single token (reference:
    analysis/common/.../core/KeywordTokenizer.java)."""

    name = "keyword"

    def analyze(self, text: str) -> List[str]:
        return [text] if text else []


class PathHierarchyAnalyzer:
    """Emit every path prefix of a delimited input (reference:
    analysis/common/.../path/PathHierarchyTokenizer.java — 'Take
    something like /a/b/c and make tokens /a, /a/b, /a/b/c'). All tokens
    share position 0 like the reference's posIncr-0 chain after the
    first; ``skip`` drops that many leading components (the tokenizer's
    skip option), useful for stripping a scheme/host from a url path."""

    def __init__(self, delimiter: str = "/", skip: int = 0):
        self.delimiter = delimiter
        self.skip = skip
        self.name = f"path_hierarchy[{delimiter}skip{skip}]"

    def analyze(self, text: str) -> List[str]:
        if not text:
            return []
        parts = text.split(self.delimiter)[self.skip :]
        parts = [p for p in parts if p]
        return [
            self.delimiter.join(parts[: i + 1]) for i in range(len(parts))
        ]

    def analyze_positions(self, text: str):
        terms = self.analyze(text)
        return terms, [0] * len(terms)


class LetterAnalyzer:
    """Maximal letter runs, lowercased (reference:
    analysis/common/.../core/LetterTokenizer.java + LowerCaseFilter)."""

    name = "letter"
    _RE = re.compile(r"[^\W\d_]+")

    def analyze(self, text: str) -> List[str]:
        return [lowercase(t) for t in self._RE.findall(text)]


class NGramAnalyzer:
    """Character n-grams of each lowercased token (reference:
    analysis/common/.../ngram/NGramTokenFilter.java: every gram length in
    [min_gram, max_gram] at every offset; short tokens are dropped)."""

    def __init__(self, min_gram: int = 2, max_gram: int = 3,
                 edge: bool = False):
        self.min_gram = min_gram
        self.max_gram = max_gram
        self.edge = edge
        self.name = ("edge_ngram" if edge else "ngram") + f"_{min_gram}_{max_gram}"
        self._base = SimpleAnalyzer()

    def analyze(self, text: str) -> List[str]:
        out: List[str] = []
        for tok in self._base.analyze(text):
            if self.edge:
                for g in range(self.min_gram, self.max_gram + 1):
                    if g <= len(tok):
                        out.append(tok[:g])
            else:
                for i in range(len(tok)):
                    for g in range(self.min_gram, self.max_gram + 1):
                        if i + g <= len(tok):
                            out.append(tok[i : i + g])
        return out


class ShingleAnalyzer:
    """Word shingles over the simple chain (reference:
    analysis/common/.../shingle/ShingleFilter.java — token n-grams;
    unigrams optionally kept)."""

    def __init__(self, min_size: int = 2, max_size: int = 2,
                 output_unigrams: bool = True, sep: str = " "):
        self.min_size = min_size
        self.max_size = max_size
        self.output_unigrams = output_unigrams
        self.sep = sep
        self.name = f"shingle_{min_size}_{max_size}"
        self._base = SimpleAnalyzer()

    def analyze(self, text: str) -> List[str]:
        toks = self._base.analyze(text)
        out: List[str] = list(toks) if self.output_unigrams else []
        for size in range(max(2, self.min_size), self.max_size + 1):
            for i in range(len(toks) - size + 1):
                out.append(self.sep.join(toks[i : i + size]))
        return out


class SynonymAnalyzer:
    """Single-token synonym expansion over a base chain (reference:
    analysis/common/.../synonym/SynonymFilter.java — the non-graph subset:
    each matching token additionally emits its synonyms at the SAME
    position, position-increment 0, so phrase queries match either form).

    Mapping keys match the BASE chain's output terms (apply to stemmed
    forms under standard_en). Deviation, documented: synonym tokens count
    toward the length norm (the reference's discountOverlaps=false
    configuration; discountOverlaps=true would skip posInc==0 tokens).

    Serializable by name — ``synonym:<base>:<k>=<v1>|<v2>,<k2>=...`` —
    so Ray workers reconstruct the exact analyzer from the config string
    (the registry is per-process; a driver-side register_analyzer wouldn't
    reach map workers).

    Usage note: boolean queries expand to a SHOULD union (SynonymQuery-ish
    semantics). PHRASE queries through this analyzer require the index to
    be synonym-expanded too — query-side expansions become additional
    same-offset phrase terms, which only match because the index emitted
    the mirror tokens (use bidirectional mappings for phrase workloads,
    e.g. ``car=auto,auto=car``)."""

    def __init__(self, base, mapping: Dict[str, List[str]], name: str = "synonym"):
        self.base = base
        self.mapping = {k: list(v) for k, v in mapping.items()}
        self.name = name

    def analyze(self, text: str) -> List[str]:
        out: List[str] = []
        mapping = self.mapping
        for t in self.base.analyze(text):
            out.append(t)
            syns = mapping.get(t)
            if syns:
                out.extend(syns)
        return out

    def analyze_positions(self, text: str):
        terms: List[str] = []
        pos: List[int] = []
        mapping = self.mapping
        for t, p in zip(*self.base.analyze_positions(text)):
            terms.append(t)
            pos.append(p)
            syns = mapping.get(t)
            if syns:
                terms.extend(syns)
                pos.extend([p] * len(syns))  # posInc = 0
        return terms, pos


class SynonymGraphAnalyzer:
    """Multi-word (graph) synonyms over a base chain (reference:
    analysis/common/src/java/org/apache/lucene/analysis/synonym/
    SynonymGraphFilter.java:33-92 — rules match runs of CONSECUTIVE
    output tokens of the base chain, greedy longest-first like the
    SynonymMap FST parse; matched spans grow side paths carrying the
    replacement token sequences). Index-time output is the FLATTENED
    stream (FlattenGraphFilter.java): Lucene's index stores positions
    but not posLength, so flattening is the faithful index-time shape.

    ``rules`` maps a tuple of consecutive base-output terms to
    ``(keep_orig, alternatives)`` — keep_orig mirrors SynonymMap.Builder
    keepOrig (the solr ``a, b`` expand format keeps originals,
    ``a => b`` replaces); each alternative is a tuple of output terms.

    Flatten contract (documented against FlattenGraphFilter's node
    renumbering): a match over output positions p..e emits alternative
    token j at position ``p + j``; tokens AFTER the match shift by
    ``(p + width) - e`` where width = the longest emitted path's last
    offset (the original path counts when kept) — a longer replacement
    opens exactly the positions its inserted graph nodes need, and a
    shorter replace-only rule closes the hole the way the flattener
    renumbers unreferenced nodes. Gap-free streams match
    FlattenGraphFilter for the m->1, 1->k and m->k shapes. Matching is
    over consecutive KEPT tokens (a dropped stopword inside a span does
    not break the rule — SynonymGraphFilter consumes the post-StopFilter
    stream), and synonym tokens count toward the length norm
    (discountOverlaps=false, the same documented deviation as
    :class:`SynonymAnalyzer`).

    Serializable by name —
    ``syngraph:<base>:<w1+w2=o1+o2|o3>,<rule>,...`` — ``+`` joins words
    inside one phrase, ``|`` separates alternative outputs, and a value
    starting with ``>`` replaces instead of expanding (solr ``=>``)."""

    def __init__(self, base, rules, name: str = "syngraph"):
        self.base = base
        norm: Dict[tuple, tuple] = {}
        for k, v in rules.items():
            key = tuple(k)
            if (
                isinstance(v, tuple)
                and len(v) == 2
                and isinstance(v[0], bool)
            ):
                keep, alts = v
            else:
                keep, alts = True, v
            alts = tuple(tuple(a) for a in alts)
            if not key or not alts or any(not a for a in alts):
                raise ValueError(f"empty synonym rule {k!r} -> {v!r}")
            norm[key] = (keep, alts)
        self.rules = norm
        self.max_len = max((len(k) for k in norm), default=1)
        self.name = name

    def _match_at(self, terms: List[str], i: int):
        """Greedy longest rule match starting at stream index ``i``
        (SynonymMap FST longest-match parse; no re-match inside a
        consumed span)."""
        top = min(self.max_len, len(terms) - i)
        for length in range(top, 0, -1):
            rule = self.rules.get(tuple(terms[i : i + length]))
            if rule is not None:
                return length, rule
        return 0, None

    def analyze_positions(self, text: str):
        base_terms, base_pos = self.base.analyze_positions(text)
        out_t: List[str] = []
        out_p: List[int] = []
        shift = 0
        i, n = 0, len(base_terms)
        while i < n:
            length, rule = self._match_at(base_terms, i)
            if not length:
                out_t.append(base_terms[i])
                out_p.append(base_pos[i] + shift)
                i += 1
                continue
            keep, alts = rule
            p = base_pos[i] + shift
            e = base_pos[i + length - 1] + shift
            if keep:
                for j in range(length):
                    out_t.append(base_terms[i + j])
                    out_p.append(base_pos[i + j] + shift)
            width = (e - p) if keep else -(1 << 30)
            for alt in alts:
                for j, t in enumerate(alt):
                    out_t.append(t)
                    out_p.append(p + j)
                width = max(width, len(alt) - 1)
            shift += (p + width) - e
            i += length
        return out_t, out_p

    def analyze(self, text: str) -> List[str]:
        return self.analyze_positions(text)[0]

    def analyze_graph(self, text: str):
        """Query-time graph decomposition: the token stream split at
        articulation points (QueryBuilder.analyzeGraph* consume this
        shape, core/.../util/QueryBuilder.java:560-640). Returns a list
        of segments; each segment is the list of alternative paths
        through that span (tuples of terms), original path first when
        kept."""
        base_terms, _ = self.base.analyze_positions(text)
        segs: List[List[tuple]] = []
        i = 0
        while i < len(base_terms):
            length, rule = self._match_at(base_terms, i)
            if not length:
                segs.append([(base_terms[i],)])
                i += 1
                continue
            keep, alts = rule
            seg: List[tuple] = []
            if keep:
                seg.append(tuple(base_terms[i : i + length]))
            seg.extend(alts)
            segs.append(seg)
            i += length
        return segs


#: non-decomposable folds ASCIIFoldingFilter maps explicitly (subset of
#: its ~2000-entry table; NFKD strip handles the accent cases)
_FOLD_MAP = {
    "ß": "ss", "æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "þ": "th",
    "ð": "d", "ł": "l", "ħ": "h", "ı": "i", "ĸ": "k", "ŋ": "n",
    "ſ": "s", "ŧ": "t",
}


class AsciiFoldingAnalyzer:
    """Fold accented/decorated Latin to ASCII over the simple chain
    (reference: analysis/common/.../miscellaneous/ASCIIFoldingFilter.java).
    Implemented as NFKD decomposition + combining-mark strip plus an
    explicit table for the non-decomposable letters (ss/ae/oe/...) — the
    common-case subset of the reference's exhaustive switch. Characters
    that still fold to nothing are dropped, and folding runs BEFORE
    tokenization so multi-char folds (ß -> ss) stay inside one token."""

    name = "ascii_folding"
    _RE = re.compile(r"[a-z0-9]+")

    def analyze(self, text: str) -> List[str]:
        import unicodedata

        lowered = lowercase(text)
        folded = "".join(_FOLD_MAP.get(c, c) for c in lowered)
        stripped = "".join(
            c
            for c in unicodedata.normalize("NFKD", folded)
            if not unicodedata.combining(c)
        )
        return self._RE.findall(stripped)


def _is_cjk(c: str) -> bool:
    o = ord(c)
    return (
        0x4E00 <= o <= 0x9FFF      # CJK Unified Ideographs
        or 0x3400 <= o <= 0x4DBF   # ext A
        or 0x3040 <= o <= 0x309F   # Hiragana
        or 0x30A0 <= o <= 0x30FF   # Katakana
        or 0xAC00 <= o <= 0xD7AF   # Hangul syllables
    )


class CJKBigramAnalyzer:
    """Overlapping CJK character bigrams, non-CJK as lowercased alnum runs
    (reference: analysis/cjk/.../CJKBigramFilter.java over
    StandardTokenizer's per-codepoint CJK tokens: adjacent CJK chars pair
    into bigrams; an isolated CJK char is emitted as a unigram —
    outputUnigrams=false default)."""

    name = "cjk_bigram"
    _RE = re.compile(r"[a-z0-9]+")

    def analyze(self, text: str) -> List[str]:
        out: List[str] = []
        run: List[str] = []
        latin: List[str] = []

        def flush_run():
            if len(run) == 1:
                out.append(run[0])
            else:
                out.extend(run[i] + run[i + 1] for i in range(len(run) - 1))
            run.clear()

        def flush_latin():
            if latin:
                out.extend(self._RE.findall(lowercase("".join(latin))))
                latin.clear()

        for c in text:
            if _is_cjk(c):
                flush_latin()
                run.append(c)
            else:
                if run:
                    flush_run()
                latin.append(c)
        if run:
            flush_run()
        flush_latin()
        return out


def soundex(word: str) -> str:
    """Classic American Soundex (the algorithm behind commons-codec's
    Soundex used by analysis/phonetic/.../PhoneticFilter.java): first
    letter + 3 digits, H/W transparent between same-coded consonants,
    vowels separate, zero-padded."""
    codes = {
        **dict.fromkeys("bfpv", "1"),
        **dict.fromkeys("cgjkqsxz", "2"),
        **dict.fromkeys("dt", "3"),
        "l": "4",
        **dict.fromkeys("mn", "5"),
        "r": "6",
    }
    w = [c for c in word.lower() if c.isalpha()]
    if not w:
        return ""
    out = w[0].upper()
    last = codes.get(w[0], "")
    for c in w[1:]:
        code = codes.get(c, "")
        if code and code != last:
            out += code
            if len(out) == 4:
                break
        if c not in "hw":
            last = code
    return out.ljust(4, "0")


class PhoneticAnalyzer:
    """Soundex codes over the simple chain (reference:
    analysis/phonetic/.../PhoneticFilter.java with a Soundex encoder).
    ``inject=True`` (the reference default) also keeps the original token
    at the same position."""

    def __init__(self, inject: bool = True):
        self.inject = inject
        self.name = "phonetic" if inject else "phonetic_replace"
        self._base = SimpleAnalyzer()

    def analyze(self, text: str) -> List[str]:
        out: List[str] = []
        for t in self._base.analyze(text):
            code = soundex(t)
            if self.inject:
                out.append(t)
                if code and code != t:
                    out.append(code)
            elif code:
                out.append(code)
        return out


class WordDelimiterAnalyzer:
    """WordDelimiterGraphFilter subset (reference:
    analysis/common/.../miscellaneous/WordDelimiterGraphFilter.java):
    whitespace pre-tokenize, then split each token on non-alphanumerics,
    lower->Upper case transitions, and letter<->digit boundaries
    (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS); output lowercased. Each
    part takes the next position; with ``catenate=True`` the joined form
    (CATENATE_ALL) is additionally emitted at the FIRST part's position
    (posInc 0). Javadoc examples hold: 'PowerShot' -> power, shot;
    'Wi-Fi' -> wi, fi; 'SD500' -> sd, 500; \"O'Neil's\" -> o, neil, s."""

    name = "word_delimiter"
    _WS = re.compile(r"\S+")
    _PART = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]+|[a-z]+|[0-9]+")

    def __init__(self, catenate: bool = False):
        self.catenate = catenate
        if catenate:
            self.name = "word_delimiter_cat"

    def analyze_positions(self, text: str):
        terms: List[str] = []
        pos: List[int] = []
        p = 0
        for w in self._WS.findall(text):
            parts = self._PART.findall(w)
            if not parts:
                continue
            first = p
            for part in parts:
                terms.append(part.lower())
                pos.append(p)
                p += 1
            if self.catenate and len(parts) > 1:
                terms.append("".join(parts).lower())
                pos.append(first)  # posInc 0 on the stacked catenation
        return terms, pos

    def analyze(self, text: str) -> List[str]:
        return self.analyze_positions(text)[0]


class KeywordRepeatAnalyzer(StandardEnglishAnalyzer):
    """KeywordRepeatFilter + PorterStem + RemoveDuplicates (reference:
    analysis/common/.../miscellaneous/KeywordRepeatFilter.java,
    RemoveDuplicatesTokenFilter.java): every non-stopword token emits the
    UNstemmed form and, when different, the stemmed form stacked at the
    same position (posInc 0) — exact-form and stem both searchable."""

    name = "keyword_repeat"

    def analyze_positions(self, text: str):
        terms: List[str] = []
        pos: List[int] = []
        for i, raw in enumerate(tokenize(text)):
            tok = lowercase(strip_possessive(raw))
            if tok in self.stopwords:
                continue
            terms.append(tok)
            pos.append(i)
            stemmed = porter_stem(tok)
            if stemmed != tok:
                terms.append(stemmed)
                pos.append(i)
        return terms, pos

    def analyze(self, text: str) -> List[str]:
        return self.analyze_positions(text)[0]


class CommonGramsAnalyzer:
    """CommonGramsFilter index-time semantics (reference:
    analysis/common/.../commongrams/CommonGramsFilter.java): over the
    simple tokenizer WITHOUT stopword removal, every adjacent pair where
    either side is a common word additionally emits the bigram
    ``a_b`` stacked at the FIRST token's position (posInc 0) — phrase-ish
    queries on stopword-adjacent pairs hit one cheap posting instead of a
    positional join."""

    name = "common_grams"
    _RE = re.compile(r"[a-z0-9]+")

    def __init__(self, common: Optional[frozenset] = None):
        self.common = ENGLISH_STOP_WORDS if common is None else common

    def analyze_positions(self, text: str):
        toks = self._RE.findall(text.lower())
        terms: List[str] = []
        pos: List[int] = []
        common = self.common
        for i, t in enumerate(toks):
            terms.append(t)
            pos.append(i)
            if i + 1 < len(toks) and (t in common or toks[i + 1] in common):
                terms.append(f"{t}_{toks[i + 1]}")
                pos.append(i)
        return terms, pos

    def analyze(self, text: str) -> List[str]:
        return self.analyze_positions(text)[0]


class _WrapAnalyzer:
    """Base for token-stream wrappers parameterized via the config-string
    registry (serializable by name, like ``synonym:``)."""

    def __init__(self, base, name: str):
        self.base = base
        self.name = name

    def analyze(self, text: str) -> List[str]:
        return self.analyze_positions(text)[0]

    def _base_positions(self, text: str):
        """Base (terms, positions); tokenizers without explicit position
        support get sequential positions."""
        if hasattr(self.base, "analyze_positions"):
            return self.base.analyze_positions(text)
        terms = self.base.analyze(text)
        return terms, list(range(len(terms)))


class LengthFilterAnalyzer(_WrapAnalyzer):
    """LengthFilter (analysis/common/.../miscellaneous/LengthFilter.java):
    keep terms with min <= len <= max; dropped terms leave a position gap
    (FilteringTokenFilter increments)."""

    def __init__(self, base, lo: int, hi: int, name: str):
        super().__init__(base, name)
        self.lo, self.hi = lo, hi

    def analyze_positions(self, text: str):
        terms, pos = self.base.analyze_positions(text)
        lo, hi = self.lo, self.hi
        kept = [(t, p) for t, p in zip(terms, pos) if lo <= len(t) <= hi]
        return [t for t, _ in kept], [p for _, p in kept]


class LimitTokenCountAnalyzer(_WrapAnalyzer):
    """LimitTokenCountFilter (consumeAllTokens=false): truncate the stream
    after max_count tokens."""

    def __init__(self, base, max_count: int, name: str):
        super().__init__(base, name)
        self.max_count = max_count

    def analyze_positions(self, text: str):
        terms, pos = self.base.analyze_positions(text)
        return terms[: self.max_count], pos[: self.max_count]


class KeepWordAnalyzer(_WrapAnalyzer):
    """KeepWordFilter (analysis/common/.../miscellaneous/
    KeepWordFilter.java): the inverse stop filter — DROP every token not
    in the keep set; dropped terms leave a position gap."""

    def __init__(self, base, keep, name: str):
        super().__init__(base, name)
        self.keep = frozenset(keep)

    def analyze_positions(self, text: str):
        terms, pos = self._base_positions(text)
        kept = [(t, p) for t, p in zip(terms, pos) if t in self.keep]
        return [t for t, _ in kept], [p for _, p in kept]


class TruncateAnalyzer(_WrapAnalyzer):
    """TruncateTokenFilter (analysis/common/.../miscellaneous/
    TruncateTokenFilter.java): hard-truncate every token to length n
    (prefix indexing idiom); positions unchanged."""

    def __init__(self, base, n: int, name: str):
        super().__init__(base, name)
        self.n = n

    def analyze_positions(self, text: str):
        terms, pos = self._base_positions(text)
        return [t[: self.n] for t in terms], pos


#: French elision articles (analysis/common/.../util/ElisionFilter.java
#: defaults from FrenchAnalyzer.DEFAULT_ARTICLES)
ELISION_ARTICLES = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu", "quoiqu",
     "lorsqu", "puisqu"]
)


class ElisionAnalyzer(_WrapAnalyzer):
    """ElisionFilter: strip a leading <article>' / <article>\u2019 prefix
    ("l'avion" -> "avion"); only meaningful over tokenizers that keep
    apostrophes (whitespace/keyword)."""

    def __init__(self, base, name: str):
        super().__init__(base, name)

    def analyze_positions(self, text: str):
        terms, pos = self._base_positions(text)
        out = []
        for t in terms:
            for sep in ("'", "\u2019"):
                i = t.find(sep)
                if 0 < i and t[:i].lower() in ELISION_ARTICLES:
                    t = t[i + 1 :]
                    break
            out.append(t)
        return out, pos


class CapitalizationAnalyzer(_WrapAnalyzer):
    """CapitalizationFilter default behavior (analysis/common/.../
    miscellaneous/CapitalizationFilter.java:36-119): every word is
    normalized to Capitalized form — first letter upper, the rest lower
    — when it reaches ``minWordLength`` (default 0; the factory docs use
    3 as the example: "and" -> "And" but "or" stays "or")."""

    def __init__(self, base, min_word_length: int, name: str):
        super().__init__(base, name)
        self.min_len = int(min_word_length)

    def analyze_positions(self, text: str):
        terms, pos = self._base_positions(text)
        out = []
        for t in terms:
            if len(t) >= self.min_len and t:
                out.append(t[0].upper() + t[1:].lower())
            else:
                out.append(t)
        return out, pos


class FingerprintAnalyzer(_WrapAnalyzer):
    """FingerprintFilter (analysis/common/.../miscellaneous/
    FingerprintFilter.java:40-160): the whole stream collapses to ONE
    output token — the SORTED, de-duplicated terms joined by the
    separator (default space); an empty stream emits nothing and the
    output is suppressed entirely when it would exceed
    ``maxOutputTokenSize`` (default 1024). The Solr/OpenRefine
    "fingerprint" dedup key."""

    def __init__(self, base, name: str, max_output_token_size: int = 1024,
                 separator: str = " "):
        super().__init__(base, name)
        self.max_size = int(max_output_token_size)
        self.sep = separator

    def analyze_positions(self, text: str):
        terms, _pos = self._base_positions(text)
        if not terms:
            return [], []
        joined = self.sep.join(sorted(set(terms)))
        if len(joined) > self.max_size:
            return [], []
        return [joined], [0]


class HyphenatedWordsAnalyzer(_WrapAnalyzer):
    """HyphenatedWordsFilter (analysis/common/.../miscellaneous/
    HyphenatedWordsFilter.java:58-120): a token ending in ``-`` joins
    with the following token(s) ("ecologi-" + "cal" -> "ecological" —
    the OCR/newsletter line-break case); the joined token sits at the
    FIRST part's position and consumed parts leave position gaps. A
    trailing unpaired hyphen token keeps its hyphen (the reference
    restores it at end-of-stream)."""

    def analyze_positions(self, text: str):
        terms, pos = self._base_positions(text)
        out_t, out_p = [], []
        buf, buf_pos = None, None
        for t, p in zip(terms, pos):
            if buf is not None:
                buf += t[:-1] if t.endswith("-") else t
                if not t.endswith("-"):
                    out_t.append(buf)
                    out_p.append(buf_pos)
                    buf, buf_pos = None, None
            elif t.endswith("-") and len(t) > 1:
                buf, buf_pos = t[:-1], p
            else:
                out_t.append(t)
                out_p.append(p)
        if buf is not None:  # unpaired trailing hyphen restored
            out_t.append(buf + "-")
            out_p.append(buf_pos)
        return out_t, out_p


class DelimitedTermFrequencyAnalyzer:
    """DelimitedTermFrequencyTokenFilter (analysis/common/.../
    miscellaneous/DelimitedTermFrequencyTokenFilter.java:30-77):
    whitespace tokens of the form ``term|N`` carry an explicit term
    frequency. The reference sets the TermFrequencyAttribute, which adds
    N to both the term's tf and the field length
    (FieldInvertState.length); emitting the term N times reproduces
    both EXACTLY under this engine's counting inverter. Tokens without
    the delimiter keep frequency 1; a malformed count raises like the
    reference's ArrayIndexOutOfBounds/NumberFormat contract. As in the
    reference, the stream is NOT position-safe — index with
    ``positions=False`` (repeated emissions would fabricate positions).
    Terms lowercase (the usual downstream lowercase filter)."""

    name = "termfreq"

    def analyze(self, text: str):
        out = []
        for tok in (text or "").split():
            if "|" in tok:
                term, _, n = tok.partition("|")
                count = int(n)  # malformed counts raise (reference contract)
                if count < 1 or not term:
                    raise ValueError(f"bad term|freq token: {tok!r}")
                out.extend([term.lower()] * count)
            else:
                out.append(tok.lower())
        return out


class ReverseAnalyzer(_WrapAnalyzer):
    """ReverseStringFilter (analysis/common/src/java/org/apache/lucene/
    analysis/reverse/ReverseStringFilter.java:35-60): every token's
    characters reversed in place — the index-side half of the
    reversed-wildcard trick (index reversed tokens, rewrite ``*ing`` to
    the prefix query ``gni*`` over them); the query engine's reversed
    term dictionary (state/segment.py reversed_terms) provides the same
    acceleration without a second field, so this filter mainly serves
    analyzer-chain parity."""

    def analyze_positions(self, text: str):
        terms, pos = self._base_positions(text)
        return [t[::-1] for t in terms], pos


def _parse_wrapped_name(name: str):
    kind, rest = name.split(":", 1)
    if kind == "length":
        lo, hi, base = rest.split(":", 2)
        return LengthFilterAnalyzer(make_analyzer(base), int(lo), int(hi), name)
    if kind == "limit":
        n, base = rest.split(":", 1)
        return LimitTokenCountAnalyzer(make_analyzer(base), int(n), name)
    if kind == "keep":
        words, base = rest.split(":", 1)
        return KeepWordAnalyzer(make_analyzer(base), words.split("|"), name)
    if kind == "truncate":
        n, base = rest.split(":", 1)
        return TruncateAnalyzer(make_analyzer(base), int(n), name)
    if kind == "elision":
        return ElisionAnalyzer(make_analyzer(rest), name)
    if kind == "reverse":
        return ReverseAnalyzer(make_analyzer(rest), name)
    if kind == "capitalize":
        n, base = rest.split(":", 1)
        return CapitalizationAnalyzer(make_analyzer(base), int(n), name)
    if kind == "fingerprint":
        return FingerprintAnalyzer(make_analyzer(rest), name)
    if kind == "hyphenated":
        return HyphenatedWordsAnalyzer(make_analyzer(rest), name)
    raise KeyError(f"unknown wrapped analyzer spec {name!r}")


def _parse_synonym_name(name: str) -> SynonymAnalyzer:
    try:
        _, base, spec = name.split(":", 2)
        mapping: Dict[str, List[str]] = {}
        for pair in spec.split(","):
            k, v = pair.split("=", 1)
            mapping[k] = v.split("|")
    except ValueError:
        raise KeyError(
            f"bad synonym analyzer spec {name!r}; expected "
            "'synonym:<base>:<term>=<syn1>|<syn2>,...'"
        ) from None
    return SynonymAnalyzer(make_analyzer(base), mapping, name=name)


def _parse_syngraph_name(name: str) -> SynonymGraphAnalyzer:
    try:
        _, base, spec = name.split(":", 2)
        rules: Dict[tuple, tuple] = {}
        for pair in spec.split(","):
            k, v = pair.split("=", 1)
            keep = True
            if v.startswith(">"):
                keep = False
                v = v[1:]
            rules[tuple(k.split("+"))] = (
                keep,
                tuple(tuple(a.split("+")) for a in v.split("|")),
            )
    except ValueError:
        raise KeyError(
            f"bad syngraph analyzer spec {name!r}; expected "
            "'syngraph:<base>:<w1+w2=o1+o2|o3>,...' ('=>' replaces)"
        ) from None
    return SynonymGraphAnalyzer(make_analyzer(base), rules, name=name)


class DelimitedPayloadAnalyzer:
    """Whitespace tokenizer + DelimitedPayloadTokenFilter analogue
    (reference: analysis/common/src/java/org/apache/lucene/analysis/
    payloads/DelimitedPayloadTokenFilter.java:53-70 — characters before
    the FIRST delimiter are the term, those after are the payload,
    decoded by an encoder; tokens without the delimiter carry no payload
    — the reference sets the payload attribute to null). Tokens are
    whitespace-split because, per the reference's own caveat, "make sure
    your Tokenizer doesn't split on the delimiter". Terms are lowercased
    (the usual lowercase filter downstream of the payload split).

    Encoders (reference: payloads/FloatEncoder.java,
    IntegerEncoder.java): ``float`` parses the payload text as a decimal
    float; ``int`` as an integer. A missing payload is represented as
    NaN — payload scoring skips it (numPayloadsSeen semantics,
    queries/payloads/PayloadScoreQuery.java PayloadSpanCollector)."""

    name = "whitespace_payload"

    def __init__(self, delimiter: str = "|", encoder: str = "float"):
        if len(delimiter) != 1:
            raise ValueError("payload delimiter must be a single character")
        if encoder not in ("float", "int"):
            raise ValueError(f"unknown payload encoder {encoder!r}")
        self.delimiter = delimiter
        self.encoder = encoder

    def _split(self, raw: str):
        i = raw.find(self.delimiter)
        if i < 0:
            return raw.lower(), float("nan")
        body = raw[i + 1:]
        val = float(body) if self.encoder == "float" else float(int(body))
        if val != val or val in (float("inf"), float("-inf")):
            # "nan" would collide with the absent-payload sentinel and
            # infinities corrupt the fold arithmetic; reject like a
            # malformed number (the reference's byte payloads have no
            # such sentinel, so this is our encoder's contract)
            raise ValueError(f"non-finite payload value {body!r}")
        return raw[:i].lower(), val

    def analyze_payloads(self, text: str):
        """(terms, positions, payloads); empty terms (token was all
        payload, e.g. ``|5``) are dropped like any empty token."""
        terms: List[str] = []
        pos: List[int] = []
        pays: List[float] = []
        for i, raw in enumerate(text.split()):
            t, p = self._split(raw)
            if t:
                terms.append(t)
                pos.append(i)
                pays.append(p)
        return terms, pos, pays

    def analyze(self, text: str) -> List[str]:
        return self.analyze_payloads(text)[0]

    def analyze_positions(self, text: str):
        terms, pos, _ = self.analyze_payloads(text)
        return terms, pos


_REGISTRY: Dict[str, Callable[[], object]] = {
    "standard_en": StandardEnglishAnalyzer,
    "standard_en_nostem": lambda: StandardEnglishAnalyzer(stem=False),
    "simple": SimpleAnalyzer,
    "en_nostem_simple": SimpleStopAnalyzer,
    "whitespace": WhitespaceAnalyzer,
    "keyword": KeywordAnalyzer,
    "letter": LetterAnalyzer,
    "ngram": NGramAnalyzer,
    "edge_ngram": lambda: NGramAnalyzer(edge=True),
    "shingle": ShingleAnalyzer,
    "ascii_folding": AsciiFoldingAnalyzer,
    "termfreq": DelimitedTermFrequencyAnalyzer,
    "cjk_bigram": CJKBigramAnalyzer,
    "phonetic": PhoneticAnalyzer,
    "phonetic_replace": lambda: PhoneticAnalyzer(inject=False),
    "word_delimiter": WordDelimiterAnalyzer,
    "word_delimiter_cat": lambda: WordDelimiterAnalyzer(catenate=True),
    "keyword_repeat": KeywordRepeatAnalyzer,
    "common_grams": CommonGramsAnalyzer,
    "path_hierarchy": PathHierarchyAnalyzer,
    "whitespace_payload": DelimitedPayloadAnalyzer,
    "whitespace_payload_int": lambda: DelimitedPayloadAnalyzer(encoder="int"),
}


def register_analyzer(name: str, factory: Callable[[], object]) -> None:
    _REGISTRY[name] = factory


def make_analyzer(name: str):
    if name.startswith("synonym:"):
        return _parse_synonym_name(name)
    if name.startswith("syngraph:"):
        return _parse_syngraph_name(name)
    if name.startswith(("length:", "limit:", "keep:", "truncate:",
                        "elision:", "reverse:", "capitalize:",
                        "fingerprint:", "hyphenated:")):
        return _parse_wrapped_name(name)
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise KeyError(
            f"unknown analyzer {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None
