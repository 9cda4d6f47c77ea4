"""Analyzers: deterministic, pure tokenization functions.

The reference configures no custom analyzer anywhere (grep over
reference: source/lambda/deploy_es/command_index.txt -> 0 hits for
``analyzer``), so its searchable ``text`` fields use Lucene's *standard*
analyzer: UAX#29 word-break tokenization + lowercase.  Our ``base``
analyzer reproduces the behaviour that matters for the corpus at hand
with a pinned, documented rule: maximal runs of ``[A-Za-z0-9_]`` are one
token (UAX#29 treats ``_`` as ExtendNumLet, i.e. ``snake_case`` is a
single token in Lucene's standard analyzer), lowercased, truncated to
32,766 utf-8 bytes (Lucene term limit; reference truncation parity:
siem/__init__.py:1131-1147).

The ``code`` analyzer (the flagship per BASELINE.json north_star) adds
code-aware sub-tokens: each base token is additionally split on ``_``,
camelCase boundaries and letter<->digit boundaries, and every distinct
expansion is emitted *in addition to* the base token (so both
``getHttpResponse`` and ``http`` match).  When the split yields exactly
the base token (plain lowercase word), no duplicate is emitted --
therefore on plain-word corpora ``code`` == ``base``, which is what the
DuckDB SQL oracles rely on.

The ``path`` analyzer tokenizes file paths: segments split on
``/ . - _`` plus the code-aware sub-splits.

All analyzers are pure functions of their input string: no locale, no
randomness, no state.  Determinism is golden-file tested.
"""

from __future__ import annotations

import re
from collections import Counter

from . import MAX_TERM_BYTES

# Maximal [A-Za-z0-9_]+ runs; ASCII-pinned on purpose (deterministic
# across Python/Unicode versions; the corpus is source code).
_BASE_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")

# camelCase + letter/digit boundary splitter, applied per '_'-piece:
#   getHTTPResponse2 -> get, HTTP, Response, 2
_CAMEL_RE = re.compile(r"[A-Z]+(?=[A-Z][a-z])|[A-Z]?[a-z]+|[A-Z]+|[0-9]+")

_PATH_SEG_RE = re.compile(r"[^/\\.]+")


def _truncate_term(tok: str) -> str:
    """utf-8-safe truncation to MAX_TERM_BYTES (parity with reference
    siem/__init__.py:1131-1147, which cuts at 32,766 bytes)."""
    if len(tok) <= MAX_TERM_BYTES // 4:
        return tok
    raw = tok.encode("utf-8")
    if len(raw) <= MAX_TERM_BYTES:
        return tok
    return raw[:MAX_TERM_BYTES].decode("utf-8", errors="ignore")


# Per-unique-raw-token memo caches: code corpora repeat identifiers
# heavily, so amortizing the lower/split/camel work per *distinct* token
# (instead of per occurrence) is a ~5x tokenizer speedup.  The caches
# hold pure-function results, so determinism is unaffected; they are
# bounded to keep long-lived actors from growing without limit.
_CACHE_LIMIT = 2_000_000
_BASE_CACHE: dict[str, str] = {}
_CODE_CACHE: dict[str, tuple[str, ...]] = {}


def _base_one(raw: str) -> str:
    tok = _BASE_CACHE.get(raw)
    if tok is None:
        tok = _truncate_term(raw.lower())
        if len(_BASE_CACHE) < _CACHE_LIMIT:
            _BASE_CACHE[raw] = tok
    return tok


def base_tokens(text: str) -> list[str]:
    """Lucene-standard-compatible: [A-Za-z0-9_]+ runs, lowercased."""
    return [_base_one(t) for t in _BASE_TOKEN_RE.findall(text)]


def subtokens(token: str) -> list[str]:
    """Code-aware expansion of one (original-case) base token."""
    out: list[str] = []
    for piece in token.split("_"):
        if piece:
            out.extend(_CAMEL_RE.findall(piece))
    return out


def _code_expand(raw: str) -> tuple[str, ...]:
    low = raw.lower()
    out = [_truncate_term(low)]
    subs = subtokens(raw)
    if len(subs) != 1 or subs[0].lower() != low:
        out.extend(_truncate_term(s.lower()) for s in subs)
    return tuple(out)


def code_tokens(text: str) -> list[str]:
    """Flagship analyzer: base token + code-aware sub-tokens.

    Sub-tokens are emitted only when the expansion differs from the base
    token itself, so plain lowercase words contribute exactly one token.
    """
    cache = _CODE_CACHE
    out: list[str] = []
    for raw in _BASE_TOKEN_RE.findall(text):
        e = cache.get(raw)
        if e is None:
            e = _code_expand(raw)
            if len(cache) < _CACHE_LIMIT:
                cache[raw] = e
        out.extend(e)
    return out


# Unicode word analyzer: full UAX#29 word-break rule machine (see
# uax29.py — WB1-WB16 over a table-driven property classifier) +
# lowercase, matching Lucene's standard tokenizer: contractions and
# decimals stay single tokens (can't / 3.14 / wi.fi), Han and Hiragana
# emit one token per character, Katakana and SE-Asian runs stay
# together, snake_case joins via ExtendNumLet.
#
# Memoized per whitespace-delimited chunk: the splitting whitespace
# classes below all force UAX#29 boundaries themselves (WSegSpace or
# Other) and never participate in a join rule, so pre-splitting
# preserves the token stream exactly while amortizing the rule machine
# over distinct chunks.  NNBSP (U+202F) is deliberately NOT in the
# split set — it is ExtendNumLet glue.
_SAFE_WS_RE = re.compile("[ \t\r\n\x0b\x0c\x85\xa0\u1680\u2000-\u200a\u2028\u2029\u205f\u3000\u2007]+")
_UNI_CACHE: dict[str, tuple[str, ...]] = {}


def unicode_tokens(text: str) -> list[str]:
    """Unicode analyzer: UAX#29 word-break tokens, lowercased (the
    Lucene standard-analyzer contract for non-ASCII text fields).

    >>> unicode_tokens("Café Straße работает 日本語です")
    ['café', 'straße', 'работает', '日', '本', '語', 'で', 'す']
    >>> unicode_tokens("can't stop 3.14 snake_case")
    ["can't", 'stop', '3.14', 'snake_case']
    """
    from .uax29 import tokenize as _uax_tokenize
    cache = _UNI_CACHE
    out: list[str] = []
    for chunk in _SAFE_WS_RE.split(text):
        if not chunk:
            continue
        e = cache.get(chunk)
        if e is None:
            e = tuple(_truncate_term(t) for t in _uax_tokenize(chunk))
            if len(cache) < _CACHE_LIMIT:
                cache[chunk] = e
        out.extend(e)
    return out


def unicode_tokens_with_positions(text: str) -> tuple[list[str], list[int]]:
    toks = unicode_tokens(text)
    return toks, list(range(len(toks)))


def path_tokens(path: str) -> list[str]:
    """Path analyzer: ``src/pkg_3/mod_7.py`` -> [src, pkg_3, pkg, 3,
    mod_7, mod, 7, py]."""
    out: list[str] = []
    for seg in _PATH_SEG_RE.findall(path):
        out.extend(code_tokens(seg))
    return out


def code_tokens_with_positions(text: str) -> tuple[list[str], list[int]]:
    """Code analyzer with term positions: each base token occupies one
    position; its sub-token expansions share that position (Lucene
    synonym semantics, position-increment 0) — so phrases match across
    either surface or split forms."""
    cache = _CODE_CACHE
    toks: list[str] = []
    poss: list[int] = []
    pos = 0
    for raw in _BASE_TOKEN_RE.findall(text):
        e = cache.get(raw)
        if e is None:
            e = _code_expand(raw)
            if len(cache) < _CACHE_LIMIT:
                cache[raw] = e
        toks.extend(e)
        poss.extend([pos] * len(e))
        pos += 1
    return toks, poss


def base_tokens_with_positions(text: str) -> tuple[list[str], list[int]]:
    toks = base_tokens(text)
    return toks, list(range(len(toks)))


def path_tokens_with_positions(path: str) -> tuple[list[str], list[int]]:
    toks = path_tokens(path)
    return toks, list(range(len(toks)))


ANALYZERS = {
    "base": base_tokens,
    "code": code_tokens,
    "path": path_tokens,
    "unicode": unicode_tokens,
}

POSITIONAL_ANALYZERS = {
    "base": base_tokens_with_positions,
    "code": code_tokens_with_positions,
    "path": path_tokens_with_positions,
    "unicode": unicode_tokens_with_positions,
}


def analyze(text: str, analyzer: str = "code") -> list[str]:
    return ANALYZERS[analyzer](text)


def term_freqs(text: str, analyzer: str = "code") -> Counter:
    """Per-document term frequencies; ``sum(values)`` is the BM25 doc
    length under the same analyzer (one pinned length policy for both
    the index path and the flat oracle — SURVEY.md §7.5.1)."""
    return Counter(ANALYZERS[analyzer](text))
