"""End-to-end crawl loop: BFS rounds, gates, work-queue cap, resume.

Policy parity targets: /root/reference/services/crawler/src/crawler.rs
53-131 (run/crawl_page), url_handler.rs:29-42 (is_english),
db.rs:124-153 (S3 batch cap).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from search_engine_spark.functions.crawl import is_english_html
from search_engine_spark.operators.crawl_loop import crawl, fetch_log
from search_engine_spark.sources.fetch import DeterministicTransport, ScriptedTransport


def _seeds(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


SEEDS = [f"https://site{i}.example/page{i}" for i in range(4)]
MIXED = DeterministicTransport(
    rate_limit_every=5, error_every=9, nonenglish_every=7, adult_every=11
)


def test_is_english_html_quirks():
    assert is_english_html('<html lang="en"><body>x</body></html>')
    assert is_english_html('<html lang="en-GB"><body>x</body></html>')
    # case-sensitive starts_with, exactly like the Rust (url_handler.rs:35-37)
    assert not is_english_html('<html lang="EN"><body>x</body></html>')
    assert not is_english_html('<html lang="de"><body>x</body></html>')
    assert not is_english_html("<html><body>no lang</body></html>")
    assert not is_english_html("")


def test_crawl_bfs_three_rounds(spark, tmp_path):
    out = str(tmp_path / "crawl")
    pages = crawl(spark, _seeds(spark, SEEDS), out, max_rounds=3, transport=MIXED)
    n_pages = pages.count()
    assert n_pages > len(SEEDS)  # BFS actually expanded
    assert pages.filter(F.col("round") == 2).count() > 0

    log = fetch_log(spark, out)
    rejects = {r["reject"] for r in log.select("reject").distinct().collect()}
    # every gate fired somewhere in the synthetic web
    assert None in rejects
    assert "NonEnglishPage" in rejects
    assert "InappropriateSite" in rejects
    assert "MalformedHttpStatus(500)" in rejects
    assert log.filter(F.col("attempts") == 2).count() > 0  # 429 retry path

    # reference dedup contract: a url is queued (hence fetched) at most once
    assert log.groupBy("url").count().filter(F.col("count") > 1).count() == 0
    # accepted pages are exactly the reject-NULL log rows
    assert n_pages == log.filter(F.col("reject").isNull()).count()


def test_crawl_gates_are_reference_exact(spark, tmp_path):
    # text must sit in TEXT_SELECTOR elements (<p>) — bare body text is
    # invisible to extract_text, quirk-exact with the reference selector
    en = b'<html lang="en"><head><title>T</title></head><body><p>hello world</p></body></html>'
    fr = b'<html lang="fr"><body><p>bonjour</p></body></html>'
    adult = b'<html lang="en"><body><p>watch xvideos now</p></body></html>'
    script = {
        "https://a.example/": [(200, None, en)],
        "https://b.example/": [(200, None, fr)],
        "https://c.example/": [(200, None, adult)],
        "https://d.example/": [(404, None, b"")],
    }
    out = str(tmp_path / "crawl")
    pages = crawl(
        spark, _seeds(spark, list(script)), out, max_rounds=1,
        transport=ScriptedTransport(script),
    )
    got = {r["url"]: r for r in fetch_log(spark, out).collect()}
    assert got["https://a.example/"]["reject"] is None
    assert got["https://b.example/"]["reject"] == "NonEnglishPage"
    assert got["https://c.example/"]["reject"] == "InappropriateSite"
    assert got["https://d.example/"]["reject"] == "MalformedHttpStatus(404)"
    rows = pages.collect()
    assert [r["url"] for r in rows] == ["https://a.example/"]
    assert rows[0]["title"] == "T"


def test_crawl_batch_cap_carries_remainder(spark, tmp_path):
    """S3 LIMIT semantics: a round fetches ≤batch_size urls; the rest
    stay queued and drain in later rounds — no work lost."""
    seeds = [f"https://solo{i}.example/" for i in range(5)]
    out = str(tmp_path / "crawl")
    crawl(
        spark, _seeds(spark, seeds), out, max_rounds=3, batch_size=2,
        transport=DeterministicTransport(n_links=0),
    )
    per_round = {
        r["round"]: r["count"]
        for r in fetch_log(spark, out).groupBy("round").count().collect()
    }
    assert per_round == {0: 2, 1: 2, 2: 1}


def _fingerprint(pages) -> list[tuple]:
    return sorted(
        (r["round"], r["url"], r["title"], hashlib.md5(bytes(r["html"])).hexdigest())
        for r in pages.collect()
    )


def test_crawl_resume_is_bit_identical_to_fresh(spark, tmp_path):
    """Interrupting after round 1 and resuming must reproduce the
    uninterrupted crawl exactly (deterministic transport ⇒ the ledgers
    make the loop a pure function of seeds + transport)."""
    fresh_dir, resumed_dir = str(tmp_path / "fresh"), str(tmp_path / "resumed")
    fresh = crawl(spark, _seeds(spark, SEEDS), fresh_dir, max_rounds=3, transport=MIXED)
    crawl(spark, _seeds(spark, SEEDS), resumed_dir, max_rounds=1, transport=MIXED)
    resumed = crawl(spark, _seeds(spark, SEEDS), resumed_dir, max_rounds=3, transport=MIXED)
    assert _fingerprint(fresh) == _fingerprint(resumed)
    assert _fingerprint(fresh)  # non-empty
