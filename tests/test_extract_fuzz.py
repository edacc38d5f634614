"""Robustness fuzz: the extractor must never crash and must be
deterministic on ARBITRARY byte soup — at 10^12 crawled pages every
malformed input that exists on the web will be seen."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.crawl import extract_links, normalize_url
from search_engine_spark.functions.presentation import (
    extract_paragraph_text,
    generate_snippet,
)
from search_engine_spark.functions.textproc import extract_text, extract_title, tokenize

html_ish = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
).map(lambda s: s.replace("\x00", ""))
tagged = st.lists(
    st.sampled_from(
        ["<p>", "</p>", "<b>", "</b>", "<html>", "<li>", "<ul>", "<a href='x'>",
         "</a>", "<h1>", "<img alt='y'>", "<script>", "</script>", "text ", "wörd ",
         "<p", ">", "&amp;", "&bogus;", "<!--", "-->", "<![CDATA[", "123 "]
    ),
    max_size=40,
).map("".join)


@given(st.one_of(html_ish, tagged))
@settings(max_examples=300, deadline=None)
def test_extract_never_crashes_and_deterministic(s):
    a, b = extract_text(s), extract_text(s)
    assert a == b
    assert extract_title(s) == extract_title(s)
    assert extract_links(s) == extract_links(s)
    assert extract_paragraph_text(s) == extract_paragraph_text(s)
    toks = tokenize(a)
    assert all(isinstance(t, str) for t in toks)


@given(st.one_of(html_ish, tagged))
@settings(max_examples=100, deadline=None)
def test_snippet_never_crashes(s):
    snip = generate_snippet(s, ["text", "wörd"])
    assert isinstance(snip, str)
    assert len(snip) <= 200


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_normalize_url_total(u):
    try:
        out = normalize_url(u)
    except ValueError:
        return  # urlsplit rejects some byte soup; rejection is fine, crash is not
    assert out.startswith("https://")


# -- fast-scanner parity (the fast path must be INVISIBLE semantically) -----

def _tree_text(el):
    """Serialize a parse tree for exact structural comparison."""
    if isinstance(el, str):
        return ("T", el)
    return ("E", el.tag, tuple(sorted(el.attrs.items())),
            tuple(_tree_text(c) for c in el.children))


def _trees(s):
    from search_engine_spark.functions.textproc import (
        _parse_html,
        _parse_html_stdlib,
    )

    return _tree_text(_parse_html(s)), _tree_text(_parse_html_stdlib(s))


@given(st.one_of(html_ish, tagged))
@settings(max_examples=300, deadline=None)
def test_fast_scanner_tree_parity_fuzz(s):
    fast, slow = _trees(s)
    assert fast == slow


def test_fast_scanner_tree_parity_handcrafted():
    cases = [
        '<html><head><title>T &amp; U</title></head><body><p>a<b>b</b>c</p></body></html>',
        '<p>one<p>two<li>x<li>y<ul><li>z</li></ul>',
        '<script>var a = "<p>not a tag</p>"; if (a<b) {}</script><p>after</p>',
        '<script></scriptx></script><p>ok</p>',
        "<a href='q?x=1&amp;y=2'>link</a><img alt=\"A &lt; B\">",
        '<br/><input disabled><p class=plain id="q">t</p>',
        '<!-- c -- comment --><!DOCTYPE html><?pi data?><p>t</p>',
        '<p>3 < 5 and <3 hearts</p>',
        '<P CLASS="X">Upper</P>',
        '<div><p>unclosed',
        '<![CDATA[a>b]]><p>after cdata</p>',       # falls back (stdlib path)
        '</ p><p>tolerant endtag</p>',             # falls back
        '<p a=">">quote-gt attr</p>',              # falls back
        '<style>p{content:"</x>"}</style><p>s</p>',
    ]
    for s in cases:
        fast, slow = _trees(s)
        assert fast == slow, s


def test_fast_scanner_parity_wikipedia_fixture():
    from pathlib import Path

    from search_engine_spark.functions.textproc import extract_text

    html = (
        Path(__file__).parent / "fixtures" / "wikipedia_article.html"
    ).read_text()
    fast, slow = _trees(html)
    assert fast == slow
    assert extract_text(html)  # non-empty through the production path


def test_fast_scanner_parity_corpus_pages():
    import numpy as np

    from search_engine_spark.sources.corpus import _page_html, _vocab

    vocab = _vocab(500)
    rng = np.random.default_rng(7)
    for _ in range(50):
        s = _page_html(rng, vocab, scale=2)
        fast, slow = _trees(s)
        assert fast == slow
