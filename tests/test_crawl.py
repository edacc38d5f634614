"""Crawl-extension functions (functions/crawl.py — SURVEY F3/F9/F10/F11/F13)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from search_engine_spark.functions.crawl import (
    blocked_url,
    crawl_frontier,
    extract_links,
    normalize_url,
    resolve_url,
)
from search_engine_spark.sources.corpus import synth_pages


def test_extract_links_document_order_with_dupes():
    html = (
        "<html><body><p><a href='/a'>one</a></p>"
        "<div><a href='https://x.example/b'>two</a></div>"
        "<a href='/a'>again</a><a>no-href</a></body></html>"
    )
    assert extract_links(html) == ["/a", "https://x.example/b", "/a"]


@pytest.mark.parametrize(
    "url,expected",
    [
        # fragment stripped
        ("http://a.example/p#frag", "https://a.example/p"),
        # utm-bearing KEYS dropped, others kept
        ("https://a.example/p?utm_source=x&q=1", "https://a.example/p?q=1"),
        # id/t keys dropped
        ("https://a.example/watch?id=9&t=30&v=abc", "https://a.example/watch?v=abc"),
        # http forced to https
        ("http://a.example/p?x=1", "https://a.example/p?x=1"),
        # no query survives → bare path
        ("https://a.example/p?utm_campaign=z", "https://a.example/p"),
    ],
)
def test_normalize_url(url, expected):
    assert normalize_url(url) == expected


def test_resolve_url():
    assert resolve_url("https://a.example/dir/page", "../x") == "https://a.example/x"
    assert resolve_url("https://a.example/dir/", "y") == "https://a.example/dir/y"
    assert (
        resolve_url("https://a.example/p", "https://b.example/q")
        == "https://b.example/q"
    )


def test_frontier_end_to_end(spark):
    pages = synth_pages(spark, 80, seed=17).select("url", "html").cache()
    frontier = crawl_frontier(pages)
    urls = [r["url"] for r in frontier.collect()]
    assert len(urls) == len(set(urls))  # deduped
    assert all(u.startswith("https://") for u in urls)
    # corpus anchors are href="/x" → resolve to https://siteN.example/x
    assert any(u.endswith("/x") for u in urls)

    # visited anti-join removes known urls
    visited = frontier.limit(3)
    rest = crawl_frontier(pages, visited=visited)
    removed = {r["url"] for r in visited.collect()}
    assert removed.isdisjoint({r["url"] for r in rest.collect()})


def test_blocked_url_predicate(spark):
    df = spark.createDataFrame(
        [("https://ok.example/a",), ("https://XVideos.example/b",)], "url string"
    )
    kept = [r["url"] for r in df.filter(~blocked_url(df.url)).collect()]
    assert kept == ["https://ok.example/a"]


class TestInappropriateFilter:
    """F9 upgraded to the reference's MECHANISM (url_handler.rs:44-69):
    obfuscation-robust matching at a severity threshold, over url then
    extracted text."""

    def _hits(self, spark, rows, **kw):
        from search_engine_spark.functions.crawl import inappropriate

        df = spark.createDataFrame(rows, "url string, text string")
        return {
            r["url"]
            for r in df.filter(
                inappropriate(F.col("url"), F.col("text"), **kw)
            ).collect()
        }

    def test_obfuscated_severe_terms_blocked(self, spark):
        rows = [
            ("https://xvideos.example/a", "hello"),
            ("https://xv1d30s.example/b", "hello"),       # leet
            ("https://x-v-i-d-e-o-s.example/c", "hello"),  # separators
            ("https://p0rnhub.example/d", "hello"),
            ("https://clean.example/e", "visit xxvideoss now"),  # repeats in text
            ("https://fine.example/f", "an ordinary page"),
        ]
        hits = self._hits(spark, rows)
        assert hits == {
            "https://xvideos.example/a",
            "https://xv1d30s.example/b",
            "https://x-v-i-d-e-o-s.example/c",
            "https://p0rnhub.example/d",
            "https://clean.example/e",
        }

    def test_compound_words_not_false_positives(self, spark):
        # review finding: strip-all-separators matched across word
        # boundaries; compound/adjacent words must pass at severe
        rows = [
            ("https://example.com/xbox-videos", "xbox videos and remix videos"),
            ("https://remix.example/v", "the remix videos channel"),
            ("https://fine.example/w", "an ordinary page"),
        ]
        assert self._hits(spark, rows) == set()
        # while the fully-separated per-letter evasion still blocks
        rows2 = [("https://x_v_i_d_e_o_s.example/z", "hello")]
        assert len(self._hits(spark, rows2)) == 1

    def test_moderate_xxx_matches(self, spark):
        # review finding: the repeat collapse ran before the \bxxx
        # check, making "xxx" unmatchable at moderate
        rows = [("https://example.com/a", "hot xxx content")]
        assert self._hits(spark, rows) == set()  # severe: no
        assert len(self._hits(spark, rows, threshold="moderate")) == 1

    def test_severe_threshold_minimizes_false_positives(self, spark):
        # the reference pins SEVERE exactly to avoid these (is_severity_
        # inappropriate comment): short ambiguous terms pass at severe
        rows = [
            ("https://sussex.ac.uk/essex", "the essex and sussex survey"),
            ("https://example.com/cornporn", "popcorn porn research"),
        ]
        assert self._hits(spark, rows) == set()
        # at moderate, boundary matches of the short terms do block
        assert self._hits(spark, rows, threshold="moderate") == {
            "https://example.com/cornporn",
        }
