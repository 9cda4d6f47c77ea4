"""UAX#29 word-break tokenization (table-driven, vendor-free).

The reference's searchable text fields use Lucene's *standard*
analyzer, whose tokenizer implements Unicode UAX#29 word-break rules
(reference configures no custom analyzer anywhere — see analysis.py
module docstring).  This module implements the rule machine WB1-WB16
(Unicode 15 rule set) over a word-break property classifier derived
from :mod:`unicodedata` categories plus the small explicit code-point
tables the spec defines (MidLetter / MidNum / MidNumLet / quotes /
ExtendNumLet / Katakana / Hebrew ranges).

Lucene-parity extensions on top of plain UAX#29 segment boundaries:

* segments are emitted as tokens only when they contain an
  alphanumeric code point (punctuation/space/emoji segments drop) —
  Lucene's grammar only *returns* word/number/ideograph tokens;
* Han ideographs and Hiragana carry no word-break property, so each
  is its own segment == Lucene's single-character IDEOGRAPHIC /
  HIRAGANA tokens;
* Southeast-Asian complex-context runs (Thai/Lao/Khmer/Myanmar —
  LineBreak=SA, excluded from ALetter by the UAX data) are kept
  together as one run, matching Lucene's SOUTHEAST_ASIAN token rule
  (plain UAX#29 would break every SA character apart).

Known approximations (documented, affect only rare code points): the
property tables are reconstructed from unicodedata categories + the
spec's explicit lists rather than parsed from WordBreakProperty.txt
(not shippable here), and Extended_Pictographic (WB3c) uses the major
emoji blocks — both only influence characters that never form
alphanumeric tokens.
"""

from __future__ import annotations

import re
import unicodedata

# word-break property classes (ints for speed)
(OTHER, CR, LF, NEWLINE, EXTEND, ZWJ, RI, FORMAT, KATAKANA, HEBREW,
 ALETTER, SQ, DQ, MIDNUMLET, MIDLETTER, MIDNUM, NUMERIC, EXTENDNUMLET,
 WSEGSPACE, SEASIAN, EXTPICT) = range(21)

_IGNORE = frozenset((EXTEND, FORMAT, ZWJ))
_AH = frozenset((ALETTER, HEBREW))
_MIDNUMLET_SET = frozenset((0x002E, 0x2018, 0x2019, 0x2024, 0xFE52,
                            0xFF07, 0xFF0E))
_MIDLETTER_SET = frozenset((0x00B7, 0x0387, 0x05F4, 0x2027, 0xFE13,
                            0xFE55, 0xFF1A))
_MIDNUM_SET = frozenset((0x002C, 0x003B, 0x037E, 0x0589, 0x060C, 0x060D,
                         0x066C, 0x07F8, 0x2044, 0xFE10, 0xFE14, 0xFE50,
                         0xFE54, 0xFF0C, 0xFF1B))
_NEWLINE_SET = frozenset((0x000B, 0x000C, 0x0085, 0x2028, 0x2029))

_KATAKANA_RANGES = ((0x30A0, 0x30FF), (0x31F0, 0x31FF), (0x32D0, 0x32FE),
                    (0x3300, 0x3357), (0xFF66, 0xFF9D),
                    (0x1B000, 0x1B000), (0x1B164, 0x1B167))
_HIRAGANA_RANGES = ((0x3040, 0x309F), (0x1B001, 0x1B11F),
                    (0x1B150, 0x1B152))
_HAN_RANGES = ((0x2E80, 0x2FDF), (0x3005, 0x3007), (0x3400, 0x4DBF),
               (0x4E00, 0x9FFF), (0xF900, 0xFAFF), (0x20000, 0x2FA1F),
               (0x30000, 0x3134F))
_HEBREW_RANGES = ((0x05D0, 0x05EA), (0x05EF, 0x05F2), (0xFB1D, 0xFB1D),
                  (0xFB1F, 0xFB28), (0xFB2A, 0xFB4F))
# LineBreak=SA complex-context scripts (Thai, Lao, Myanmar, Khmer, Tai)
_SEASIAN_RANGES = ((0x0E01, 0x0E3A), (0x0E40, 0x0E5B),
                   (0x0E81, 0x0EDF), (0x1000, 0x109F),
                   (0x1780, 0x17DD), (0x1950, 0x19DF), (0x1A20, 0x1AAF))
_EXTPICT_RANGES = ((0x1F000, 0x1FAFF), (0x2600, 0x27BF),
                   (0x2B00, 0x2BFF), (0xFE0F, 0xFE0F), (0x2764, 0x2764))


def _in_ranges(cp: int, ranges) -> bool:
    for lo, hi in ranges:
        if lo <= cp <= hi:
            return True
    return False


def _classify(ch: str) -> int:
    cp = ord(ch)
    if cp == 0x000D:
        return CR
    if cp == 0x000A:
        return LF
    if cp in _NEWLINE_SET:
        return NEWLINE
    if cp == 0x200D:
        return ZWJ
    if cp == 0x200C:
        return EXTEND            # ZWNJ is Grapheme_Extend
    if 0x1F1E6 <= cp <= 0x1F1FF:
        return RI
    if cp == 0x0027:
        return SQ
    if cp == 0x0022:
        return DQ
    if cp in _MIDNUMLET_SET:
        return MIDNUMLET
    if cp in _MIDLETTER_SET:
        return MIDLETTER
    if cp in _MIDNUM_SET:
        return MIDNUM
    if cp == 0x202F:             # NNBSP is ExtendNumLet glue, not space
        return EXTENDNUMLET
    cat = unicodedata.category(ch)
    if cat in ("Mn", "Mc", "Me"):
        return EXTEND
    if cat == "Cf":
        return FORMAT
    if cat == "Pc":
        return EXTENDNUMLET
    if cat == "Nd":
        return NUMERIC
    if cat == "Zs":
        # WSegSpace = Zs minus the no-break "glue" spaces
        return OTHER if cp in (0x00A0, 0x2007) else WSEGSPACE
    if _in_ranges(cp, _KATAKANA_RANGES):
        return KATAKANA
    if _in_ranges(cp, _HIRAGANA_RANGES) or _in_ranges(cp, _HAN_RANGES):
        return OTHER             # ideograph/hiragana: singleton segments
    if _in_ranges(cp, _SEASIAN_RANGES):
        return SEASIAN
    if _in_ranges(cp, _HEBREW_RANGES):
        return HEBREW
    if cat in ("Lu", "Ll", "Lt", "Lm", "Lo", "Nl"):
        return ALETTER
    if _in_ranges(cp, _EXTPICT_RANGES):
        return EXTPICT
    return OTHER


_CLASS_CACHE: dict[str, int] = {}


def _cls(ch: str) -> int:
    c = _CLASS_CACHE.get(ch)
    if c is None:
        c = _classify(ch)
        if len(_CLASS_CACHE) < 1_000_000:
            _CLASS_CACHE[ch] = c
    return c


_W13A_LEFT = frozenset((ALETTER, HEBREW, NUMERIC, KATAKANA, EXTENDNUMLET))
_W13B_RIGHT = frozenset((ALETTER, HEBREW, NUMERIC, KATAKANA))
_MIDL_SQ = frozenset((MIDLETTER, MIDNUMLET, SQ))
_MIDN_SQ = frozenset((MIDNUM, MIDNUMLET, SQ))


def word_segments(text: str) -> list[str]:
    """UAX#29 WB1-WB16 segmentation of ``text`` (every segment,
    including spaces/punctuation — token filtering happens in
    :func:`tokenize`)."""
    n = len(text)
    if n == 0:
        return []
    cls = [_cls(c) for c in text]

    def nxt(i: int) -> int | None:
        j = i + 1
        while j < n and cls[j] in _IGNORE:
            j += 1
        return cls[j] if j < n else None

    breaks = [False] * (n + 1)
    breaks[0] = breaks[n] = True
    prev: int | None = None      # resolved class of last non-ignorable
    prev2: int | None = None
    ri_run = 0
    for i in range(1, n):
        lraw = cls[i - 1]
        if lraw not in _IGNORE:
            prev2 = prev
            prev = lraw
            ri_run = ri_run + 1 if lraw == RI else 0
        r = cls[i]
        if lraw == CR and r == LF:                                 # WB3
            b = False
        elif lraw in (CR, LF, NEWLINE):                            # WB3a
            b = True
        elif r in (CR, LF, NEWLINE):                               # WB3b
            b = True
        elif lraw == ZWJ and r == EXTPICT:                         # WB3c
            b = False
        elif lraw == WSEGSPACE and r == WSEGSPACE:                 # WB3d
            b = False
        elif r in _IGNORE:                                         # WB4
            b = False
        else:
            left = prev if prev is not None else lraw
            if left in _AH and r in _AH:                           # WB5
                b = False
            elif left in _AH and r in _MIDL_SQ and nxt(i) in _AH:  # WB6
                b = False
            elif prev2 in _AH and left in _MIDL_SQ and r in _AH:   # WB7
                b = False
            elif left == HEBREW and r == SQ:                       # WB7a
                b = False
            elif left == HEBREW and r == DQ and nxt(i) == HEBREW:  # WB7b
                b = False
            elif prev2 == HEBREW and left == DQ and r == HEBREW:   # WB7c
                b = False
            elif left == NUMERIC and r == NUMERIC:                 # WB8
                b = False
            elif left in _AH and r == NUMERIC:                     # WB9
                b = False
            elif left == NUMERIC and r in _AH:                     # WB10
                b = False
            elif prev2 == NUMERIC and left in _MIDN_SQ \
                    and r == NUMERIC:                              # WB11
                b = False
            elif left == NUMERIC and r in _MIDN_SQ \
                    and nxt(i) == NUMERIC:                         # WB12
                b = False
            elif left == KATAKANA and r == KATAKANA:               # WB13
                b = False
            elif left == SEASIAN and r == SEASIAN:     # Lucene SA runs
                b = False
            elif left in _W13A_LEFT and r == EXTENDNUMLET:         # WB13a
                b = False
            elif left == EXTENDNUMLET and r in _W13B_RIGHT:        # WB13b
                b = False
            elif left == RI and r == RI and ri_run % 2 == 1:   # WB15/16
                b = False
            else:                                                  # WB999
                b = True
        breaks[i] = b
    out: list[str] = []
    start = 0
    for i in range(1, n + 1):
        if breaks[i]:
            out.append(text[start:i])
            start = i
    return out


def tokenize(text: str) -> list[str]:
    """Lucene-standard-analyzer tokens: UAX#29 segments that contain an
    alphanumeric code point, lowercased.

    >>> tokenize("can't stop 3.14, wi.fi foo:bar")
    ["can't", 'stop', '3.14', 'wi.fi', 'foo', 'bar']
    >>> tokenize("snake_case 1,234.56")
    ['snake_case', '1,234.56']
    """
    return [seg.lower() for seg in word_segments(text)
            if any(c.isalnum() for c in seg)]
