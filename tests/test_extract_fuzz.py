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
