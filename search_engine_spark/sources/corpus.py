"""Deterministic synthetic Common-Crawl-style page corpus.

The engine's own test/bench corpus (BASELINE.md: "engine's own seeded
synthetic page corpus", seed-parameterized; FIXTURES.md §1 synthesis
rules). Pages are well-formed HTML5 exercising every extraction path the
reference's goldens pin (SURVEY quirks Q1-Q3): headings, paragraphs with
nested inline tags, anchors (whose text must NOT extract — Q1), ul/ol
lists, img[alt], script/style noise, digit-bearing tokens (dropped by the
tokenizer), stop words from both lists, diacritic words, and a
Zipf-distributed vocabulary so head-term skew is real. ~5% non-`en` rows.

Generation is DISTRIBUTED and deterministic: `spark.range(n)` partitions
the id space across executors and each row's content is a pure function
of (seed, id) — no driver-side materialization, so the same generator
scales from 1k test pages to a bench corpus bounded only by cluster size.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.functions.textproc import extract_text

# Reference test vocabulary (parse_page.rs goldens, README demo queries)
# seeded into the head of the Zipf distribution so the rank-identity
# query set always has matches.
_SEED_VOCAB = [
    "hippopotamus", "ladder", "pipe", "seagull", "elephant", "gumball",
    "hitman", "persona", "strikers", "rivers", "bridge", "castle",
    "meadow", "tundra", "glacier", "harbor", "lantern", "orchard",
]

_DIACRITIC_WORDS = ["café", "résumé", "naïve", "jalapeño", "über", "señor"]
_STOPWORD_SPRINKLE = ["the", "is", "was", "we", "then", "world", "won", "a", "of"]
_LANGS = ["en", "en", "en", "en-US", "en-GB", "de", "fr"]  # ~5% non-en via rng below


def _vocab(size: int) -> list[str]:
    """Deterministic vocabulary: seed vocab then generated CV-syllable words."""
    words = list(_SEED_VOCAB)
    cons = "bcdfglmnprstvz"
    vows = "aeiou"
    k = 0
    while len(words) < size:
        w, x = "", k
        for _ in range(3):
            w += cons[x % len(cons)] + vows[(x // len(cons)) % len(vows)]
            x //= len(cons) * len(vows)
        words.append(w + "or")
        k += 1
    return words[:size]


def _page_html(rng: np.random.Generator, zipf_words: list[str], scale: int = 1) -> str:
    def sent(n: int) -> str:
        toks = []
        for _ in range(n):
            r = rng.random()
            if r < 0.04:
                toks.append(str(rng.integers(0, 9999)))  # digit token → dropped
            elif r < 0.07:
                toks.append(_DIACRITIC_WORDS[rng.integers(0, len(_DIACRITIC_WORDS))])
            elif r < 0.22:
                toks.append(_STOPWORD_SPRINKLE[rng.integers(0, len(_STOPWORD_SPRINKLE))])
            else:
                # Zipf pick over the vocab (head-term skew is real)
                idx = min(int(rng.zipf(1.35)) - 1, len(zipf_words) - 1)
                toks.append(zipf_words[idx])
        return " ".join(toks)

    title = sent(int(rng.integers(2, 6)))
    parts = [f"<html><head><title>{title}</title>",
             "<style>.nav{position:fixed}</style>",
             '<script>var x = "noise noise";</script>',
             "</head><body>",
             f"<h1>{sent(int(rng.integers(2, 7)))}</h1>"]
    def para(n_sents: int) -> str:
        # sentence punctuation: stripped by the tokenizer (ASCII punct),
        # but load-bearing for the snippet path's phrase splitting
        return " ".join(
            sent(int(rng.integers(4, 12))) + rng.choice([".", ".", ".", "!", "?", ","])
            for _ in range(n_sents)
        )

    # `scale` multiplies paragraph count (bench realism: ~10x gives
    # Common-Crawl-sized ~10 KB pages); scale=1 is byte-identical to
    # this generator version with scale omitted (NOT to corpora from
    # pre-`scale` versions: introducing the per-paragraph draws changed
    # the rng stream)
    for _ in range(int(rng.integers(2, 7)) * scale):
        inline = rng.random()
        body = para(int(rng.integers(1, 4)))
        if inline < 0.3:
            body += f" <b>{sent(3)}</b> <em>{sent(2)}</em>"
        if rng.random() < 0.25:  # quirk Q1: anchor text must NOT extract
            body += f' <a href="/x">{sent(2)}</a>'
        parts.append(f"<p>{body}</p>")
    if rng.random() < 0.4:
        tag = "ul" if rng.random() < 0.5 else "ol"
        items = "".join(f"<li>{sent(int(rng.integers(1, 5)))}</li>"
                        for _ in range(int(rng.integers(2, 5))))
        parts.append(f"<{tag}>{items}</{tag}>")
    if rng.random() < 0.3:
        parts.append(f'<img src="i.jpg" alt="{sent(int(rng.integers(1, 4)))}">')
    parts.append("</body></html>")
    return "".join(parts)


def synth_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    vocab_size: int = 2000,
    partitions: int | None = None,
    scale: int = 1,
) -> DataFrame:
    """pages(url, warc_ts, html binary, text, lang) — the input_hint shape.

    `text` is pre-filled with the shared `extract_text` so the per-row
    byte-identity invariant (engine recompute == stored text) is testable.
    """
    zipf_words = _vocab(vocab_size)
    epoch = _dt.datetime(2025, 6, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(np.uint64(seed) * np.uint64(1_000_003) + np.uint64(i))
                html = _page_html(rng, zipf_words, scale)
                out["url"].append(f"https://site{i % 97}.example/page/{i:08d}")
                out["warc_ts"].append(epoch + _dt.timedelta(seconds=i))
                out["html"].append(html.encode("utf-8"))
                out["text"].append(extract_text(html))
                out["lang"].append(_LANGS[int(rng.integers(0, len(_LANGS) * 4)) % len(_LANGS)]
                                   if rng.random() < 0.35 else "en")
            yield pd.DataFrame(out)

    parts = partitions or max(2, spark.sparkContext.defaultParallelism)
    return (
        spark.range(0, n, numPartitions=parts)
        .mapInPandas(gen, schema="url string, warc_ts timestamp, html binary, text string, lang string")
    )
