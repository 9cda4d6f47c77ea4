"""UAX#29 word-break golden tests (rule machine WB1-WB16 + the
Lucene-parity emission rules — see uax29.py module docstring)."""

import pytest

from siem_on_amazon_opensearch_service_ray.uax29 import tokenize, word_segments

DQ, SQ = chr(34), chr(39)
HEB = chr(0x5DE) + DQ + chr(0x5E9) + " " + chr(0x5D0) + SQ
NNBSP = "1" + chr(0x202F) + "234"
ZWNJ = "a" + chr(0x200C) + "b"
FLAGS = chr(0x1F1FA) + chr(0x1F1F8) + " hi " + chr(0x1F44D)

CASES = [
    # WB6/7: MidNumLet/SQ between letters joins
    ("can't stop 3.14, wi.fi foo:bar",
     ["can't", "stop", "3.14", "wi.fi", "foo", "bar"]),
    # WB13a/b ExtendNumLet; WB11/12 MidNum between numerics
    ("snake_case 1,234.56", ["snake_case", "1,234.56"]),
    # latin-1 / cyrillic letters; Han + hiragana singletons
    ("Café Straße работает 日本語です",
     ["café", "straße", "работает", "日", "本", "語", "で", "す"]),
    # katakana runs stay together (WB13)
    ("日本語のドキュメント", ["日", "本", "語", "の", "ドキュメント"]),
    # trailing/leading quote never joins (WB6 needs a following letter)
    ("a'b a' 'a", ["a'b", "a", "a"]),
    # chained MidNumLet; punctuation-only segments drop
    ("a.b.c ...", ["a.b.c"]),
    # comma is MidNum: joins numerics only
    ("a,b 1,2", ["a", "b", "1,2"]),
    # colon was removed from MidLetter (Unicode 8); middle dot stays
    ("x:y a·b", ["x", "y", "a·b"]),
    # hebrew gershayim (DQ) and geresh (SQ) join/trail per WB7a-c
    (HEB, [chr(0x5DE) + DQ + chr(0x5E9), chr(0x5D0) + SQ]),
    # regional-indicator pairs and emoji are non-alnum: dropped
    (FLAGS, ["hi"]),
    # SE-Asian complex-context runs stay together (Lucene SA rule)
    ("สวัสดี ok", ["สวัสดี", "ok"]),
    ("3a a3 a_1 _x", ["3a", "a3", "a_1", "_x"]),
    ("one\ntwo\r\nthree", ["one", "two", "three"]),
    # ZWNJ is Extend (WB4): transparent inside a word
    (ZWNJ, ["a" + chr(0x200C) + "b"]),
    # NNBSP is ExtendNumLet glue, not whitespace
    (NNBSP, ["1" + chr(0x202F) + "234"]),
    ("", []),
    ("getHTTPResponse2", ["gethttpresponse2"]),
]


@pytest.mark.parametrize("text,want", CASES, ids=range(len(CASES)))
def test_uax29_tokens(text, want):
    assert tokenize(text) == want


def test_segments_cover_text():
    for text, _ in CASES:
        assert "".join(word_segments(text)) == text


def test_analyzer_wiring_and_memo():
    from siem_on_amazon_opensearch_service_ray.analysis import (
        ANALYZERS, unicode_tokens)
    assert ANALYZERS["unicode"] is unicode_tokens
    text = "can't stop 1,234.56 日本語 snake_case " * 3
    once = unicode_tokens(text)
    assert unicode_tokens(text) == once        # memo path identical
    assert once[:4] == ["can't", "stop", "1,234.56", "日"]


def test_combining_mark_attaches():
    # e + COMBINING ACUTE stays one token (WB4 Extend)
    s = "cafe" + chr(0x0301) + " x"
    toks = tokenize(s)
    assert toks == ["cafe" + chr(0x0301), "x"]
