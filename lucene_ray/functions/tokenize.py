"""Standard tokenizer: UAX#29-style word segmentation with a fast ASCII path.

Models the reference's StandardTokenizer semantics (reference:
core/src/java/org/apache/lucene/analysis/standard/StandardTokenizer.java:31-32,
84-105 — UAX#29 word-break rules, generated JFlex DFA, and the 255-char
max-token chop where over-long runs are SPLIT, not dropped):

* alphanumeric runs form tokens;
* a single mid-letter joiner (' ’ ＇ · ‧) between two
  letters does not break  ("can't", "o’neill");
* a single '.' between two letters or between two digits does not break
  ("u.s.a", "3.14");
* a single ',' between two digits does not break ("1,024");
* '_' (ExtendNumLet) joins alphanumerics ("foo_bar");
* CJK ideographs and Hiragana are emitted as single-codepoint tokens
  (UAX#29 gives Han no joining rule); Katakana runs form one token;
* everything else breaks and is discarded;
* tokens longer than MAX_TOKEN_LEN=255 chars are chopped into 255-char pieces.

The ASCII fast path is a compiled regex + joiner revalidation and is verified
equivalent to the generic state machine on ASCII input by property tests.
"""

from __future__ import annotations

import re
import unicodedata
from typing import List

MAX_TOKEN_LEN = 255

_LETTER_JOIN = frozenset("'’＇·‧")
_DIGIT_DOT = frozenset(".．")
_DIGIT_COMMA = frozenset(",，")
_EXTEND_NUM_LET = frozenset("_＿")

# ASCII fast path: candidate tokens, then revalidate interior joiners.
_ASCII_TOKEN_RE = re.compile(r"[0-9A-Za-z_]+(?:['.,][0-9A-Za-z_]+)*")
_ASCII_JOINER_RE = re.compile(r"['.,]")


def _is_ascii(s: str) -> bool:
    return s.isascii()


def _valid_ascii_joiner(left: str, j: str, right: str) -> bool:
    if j == "'":
        return left.isalpha() and right.isalpha()
    if j == ".":
        return (left.isalpha() and right.isalpha()) or (
            left.isdigit() and right.isdigit()
        )
    # ','
    return left.isdigit() and right.isdigit()


def _split_invalid(match: str) -> List[str]:
    """Split a regex candidate at joiners whose neighbours disallow joining."""
    parts: List[str] = []
    start = 0
    for m in _ASCII_JOINER_RE.finditer(match):
        p = m.start()
        if not _valid_ascii_joiner(match[p - 1], match[p], match[p + 1]):
            parts.append(match[start:p])
            start = p + 1
    parts.append(match[start:])
    return parts


def _chop(tok: str, out: List[str]) -> None:
    if len(tok) <= MAX_TOKEN_LEN:
        if tok:
            out.append(tok)
        return
    for i in range(0, len(tok), MAX_TOKEN_LEN):
        piece = tok[i : i + MAX_TOKEN_LEN]
        if piece:
            out.append(piece)


def _tokenize_ascii(text: str) -> List[str]:
    out: List[str] = []
    for m in _ASCII_TOKEN_RE.finditer(text):
        s = m.group()
        if len(s) <= MAX_TOKEN_LEN and not ("'" in s or "." in s or "," in s):
            out.append(s)
            continue
        for part in _split_invalid(s):
            _chop(part, out)
    return out


# ---------------------------------------------------------------------------
# Generic (non-ASCII) state machine
# ---------------------------------------------------------------------------

# codepoint classes
_C_BREAK = 0
_C_LETTER = 1
_C_DIGIT = 2
_C_HAN = 3  # emitted as single-codepoint tokens (incl. Hiragana)
_C_KATAKANA = 4
_C_EXTEND = 5  # combining marks / format chars: attach to previous
_C_LJOIN = 6
_C_DDOT = 7
_C_DCOMMA = 8
_C_ENL = 9

_HAN_RANGES = (
    (0x2E80, 0x2EFF), (0x3005, 0x3007), (0x3400, 0x4DBF), (0x4E00, 0x9FFF),
    (0xF900, 0xFAFF), (0x20000, 0x2A6DF), (0x2A700, 0x2EBEF),
    (0x3040, 0x309F),  # Hiragana treated like Han: single-codepoint tokens
)
_KATAKANA_RANGES = ((0x30A0, 0x30FF), (0x31F0, 0x31FF), (0xFF66, 0xFF9D))


def _classify(ch: str) -> int:
    cp = ord(ch)
    if cp < 128:
        if ch.isalnum():
            return _C_DIGIT if ch.isdigit() else _C_LETTER
        if ch == "_":
            return _C_ENL
        if ch == "'":
            return _C_LJOIN
        if ch == ".":
            return _C_DDOT
        if ch == ",":
            return _C_DCOMMA
        return _C_BREAK
    for lo, hi in _HAN_RANGES:
        if lo <= cp <= hi:
            return _C_HAN
    for lo, hi in _KATAKANA_RANGES:
        if lo <= cp <= hi:
            return _C_KATAKANA
    if ch in _LETTER_JOIN:
        return _C_LJOIN
    if ch in _DIGIT_DOT:
        return _C_DDOT
    if ch in _DIGIT_COMMA:
        return _C_DCOMMA
    if ch in _EXTEND_NUM_LET:
        return _C_ENL
    cat = unicodedata.category(ch)
    if cat[0] == "L":
        return _C_LETTER
    if cat == "Nd":
        return _C_DIGIT
    if cat[0] == "M" or cat == "Cf":
        return _C_EXTEND
    return _C_BREAK

_ALNUM = frozenset((_C_LETTER, _C_DIGIT, _C_ENL))


def _tokenize_generic(text: str) -> List[str]:
    out: List[str] = []
    n = len(text)
    i = 0
    cls = [_classify(c) for c in text]
    while i < n:
        c = cls[i]
        if c == _C_HAN:
            out.append(text[i])
            i += 1
            continue
        if c == _C_KATAKANA:
            j = i + 1
            while j < n and cls[j] in (_C_KATAKANA, _C_EXTEND):
                j += 1
            _chop("".join(text[k] for k in range(i, j) if cls[k] == _C_KATAKANA), out)
            i = j
            continue
        if c in _ALNUM:
            # build an alphanumeric token with conditional joiners
            buf = [text[i]]
            last_cls = c
            j = i + 1
            while j < n:
                cj = cls[j]
                if cj in _ALNUM:
                    buf.append(text[j])
                    last_cls = cj
                    j += 1
                    continue
                if cj == _C_EXTEND:
                    j += 1
                    continue
                if cj in (_C_LJOIN, _C_DDOT, _C_DCOMMA) and j + 1 < n:
                    nxt = cls[j + 1]
                    ok = False
                    if cj == _C_LJOIN:
                        ok = last_cls == _C_LETTER and nxt == _C_LETTER
                    elif cj == _C_DDOT:
                        ok = (last_cls == _C_LETTER and nxt == _C_LETTER) or (
                            last_cls == _C_DIGIT and nxt == _C_DIGIT
                        )
                    else:  # comma
                        ok = last_cls == _C_DIGIT and nxt == _C_DIGIT
                    if ok:
                        buf.append(text[j])
                        buf.append(text[j + 1])
                        last_cls = nxt
                        j += 2
                        continue
                break
            _chop("".join(buf), out)
            i = j
            continue
        i += 1
    return out


def tokenize(text: str) -> List[str]:
    """Segment ``text`` into standard tokens (case preserved)."""
    if not text:
        return []
    if _is_ascii(text):
        return _tokenize_ascii(text)
    return _tokenize_generic(text)
