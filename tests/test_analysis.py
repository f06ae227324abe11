"""Frozen analysis-chain tests: tokenizer properties + the byte-identical
extraction invariant (BASELINE.json:15, SURVEY.md §5.3-5.4)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from oculus_crawl_spark.functions.analysis import extract_text, tokenize, wrap_html


@given(st.text(max_size=500))
@settings(max_examples=300, deadline=None)
def test_tokenize_deterministic_and_ascii_lower(text):
    toks = tokenize(text)
    assert toks == tokenize(text)  # deterministic
    for t in toks:
        assert t == t.lower()
        assert t.isascii() and t.isalnum()


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_tokenize_idempotent_on_own_output(text):
    toks = tokenize(text)
    assert tokenize(" ".join(toks)) == toks


@given(st.text(max_size=300), st.integers(min_value=0, max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_extract_wrap_roundtrip(text, doc_id):
    """extract(wrap(t)) == t byte-identically for whitespace-collapsed t —
    the per-row invariant of BASELINE.json:15 holds by construction."""
    collapsed = " ".join(text.split())
    assert extract_text(wrap_html(collapsed, doc_id)) == collapsed


GOLDEN = [
    # (html, expected_text) — hand-written spec cases, frozen.
    (b"<html><body><p>hello world</p></body></html>", "hello world"),
    (b"<html><head><title>IGNORED</title></head><body>kept</body></html>", "kept"),
    (b"<body><script>var x=1;</script>visible<style>.a{}</style></body>", "visible"),
    (b"<body><!-- comment -->text</body>", "text"),
    (b"<p>a&amp;b &lt;tag&gt; &#65;</p>", "a&b <tag> A"),
    (b"<div>nested <span>tags <b>deep</b></span> here</div>", "nested tags deep here"),
    (b"<p>  lots \n\t of\r\nspace  </p>", "lots of space"),
    (b"<p>\xe4\xb8\xad\xe6\x96\x87 text</p>", "中文 text"),  # UTF-8 multibyte
    (b"", ""),
    (b"<html><body></body></html>", ""),
    (b'<a href="http://x.com?a=1&amp;b=2">link</a>', "link"),
    (b"<SCRIPT>UPPER</SCRIPT>ok", "ok"),
    (b"plain text no tags", "plain text no tags"),
    (b"<p>broken <unclosed", "broken"),
]


def test_extraction_golden_byte_identical():
    for html, expected in GOLDEN:
        got = extract_text(html)
        assert got == expected, (html, got, expected)


def test_tokenize_examples():
    assert tokenize("Hello, World! 42") == ["hello", "world", "42"]
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("a-b_c.d") == ["a", "b", "c", "d"]
    assert tokenize("CaseFOLD ß") == ["casefold", "ss"]  # ß casefolds to ss


def test_tokenize_udf_batch_matches_spec_function():
    """The vectorized tokenize UDF body (.str normalize/casefold/findall
    C-passes) must equal the per-row frozen spec on unicode edge cases —
    including casefold expansions, astral chars, None and empty."""
    import pandas as pd

    from oculus_crawl_spark.functions.analysis import tokenize, tokenize_udf

    texts = [
        None, "", "  ", "Hello World 123", "ẞ İstanbul",
        "straße STRASSE Σοφός", "àb ćd",  # combining marks (NFC)
        "ＡＢＣ ๑๒๓ 𝔘𝔫𝔦", "x!y@z#1$2%3", "dup dup DUP",
    ]
    s = pd.Series(texts, dtype=object)
    got = tokenize_udf.func(s)
    for g, t in zip(got, texts):
        assert list(g) == tokenize(t), repr(t)
