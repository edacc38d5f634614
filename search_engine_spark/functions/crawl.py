"""Crawl-side functions (SURVEY §2.2 F3, F9, F10, F11, F13).

The reference's crawler (services/crawler/src/) fetches live pages; our
input table is pre-crawled, so these exist for the crawl-graph
EXTENSION path: link extraction over stored html, URL normalization /
resolution / dedup for frontier construction, and the policy filter.
All heavy ops are Arrow-batched pandas UDFs; the frontier dedup and
policy filter are pure Catalyst.

Semantics re-expressed from the reference (not copied):
- link extraction (crawler.rs:248-261): every `a[href]` attribute
  value, document order, including duplicates.
- URL normalization (url_handler.rs:78-117): strip `#fragment`; drop
  query pairs whose KEY contains "utm" or equals "id"/"t"; force
  `https://netloc+path` (+ surviving query).
- relative resolution (utils.rs:59-77): join href against base url.
- adult filter (url_handler.rs:44-69): the reference scores url+text
  with the rustrict profanity ML crate (≥SEVERE blocks) plus a custom
  trie entry; ours is the keyword-set predicate SURVEY §2.2 F9 plans —
  policy-pluggable, rank-irrelevant.
- frontier dedup (crawler.rs:112-115, page.rs:66-136): first-seen wins
  after normalization.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urljoin, urlparse

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BooleanType, StringType

from search_engine_spark.functions.textproc import _decode, _Element, _parse_html

# F9 keyword sets (policy-pluggable). The reference scores url+text with
# the rustrict crate at the SEVERE threshold plus a custom trie entry
# (url_handler.rs:8-69). We re-express rustrict's MECHANISM — matching
# robust to leetspeak/confusable substitution, character repetition, and
# separator obfuscation, with a severity threshold — as pure Catalyst
# column ops (translate + regexp), with a deliberately small vendored
# term list (the reference's own custom trie holds one entry; the policy
# list is a deployment concern, the obfuscation-robust matcher is the
# engine feature).
BLOCKED_KEYWORDS = frozenset({"xvideos", "xxx", "porn"})
# severe: distinctive adult-site tokens — substring on the collapsed
# fold, or the fully-separated per-letter evasion ("x-v-i-d-e-o-s")
SEVERE_TERMS = ("xvideos", "pornhub", "xhamster", "xnxx", "redtube", "youporn")
# moderate: short/ambiguous tokens — matched only at word boundaries on
# the folded text ("sussex"/"essex" must NOT match)
MODERATE_TERMS = ("porn", "xxx")


def fold_leet(c) -> "F.Column":
    """Confusable fold only: lowercase + leet map (0→o, 3→e, @→a, $→s,
    …). Pure codegen; no repeat collapse (moderate terms like 'xxx'
    must stay visible — review finding r2)."""
    x = F.lower(c)
    return F.translate(x, "@$!|013457", "asiloieast")


def fold_obfuscation(c) -> "F.Column":
    """fold_leet + collapse 3+ repeated letters/digits to one
    ('xxvideoss' → 'xvideos'). Collapse is scoped to [a-z0-9] runs —
    the obfuscation target — which keeps the transform RE2-expressible
    for SQL twins (RE2 has no backreferences, but per-character
    `a{3,}` runs enumerate)."""
    return F.regexp_replace(fold_leet(c), r"([a-z0-9])\1\1+", "$1")


def _spaced_term_re(kw: str) -> str:
    """'xvideos' → 'x[-_. ]v[-_. ]i…': the fully-punctuated evasion
    (a separator between EVERY adjacent letter pair). Requiring every
    gap avoids the compound false positive 'xbox-videos' / 'xbox
    videos' — one joining separator reads as a word boundary, the
    per-letter pattern reads as deliberate obfuscation."""
    return r"[-_. ]".join(re.escape(ch) for ch in kw)


def inappropriate(url_col, text_col=None, threshold: str = "severe") -> "F.Column":
    """F9: reference is_inappropriate_page semantics (url_handler.rs:
    44-69) — the url is scored first, then the extracted text; blocked
    iff either crosses the threshold. threshold='severe' (the
    reference's production setting, minimizes false positives) or
    'moderate' (adds LEADING-word-boundary prefix matches of the short
    terms: 'porn', 'porny', 'pornhub' all fire, 'sussex' does not —
    the boundary is deliberately required only on the left so
    suffixed/pluralized variants are caught; 'xxxl' firing is the
    accepted cost of that trade).

    Severe matching = substring on the repeat-collapsed fold (leet +
    repeated-char evasions) OR the fully-separated per-letter pattern
    ('x-v-i-d-e-o-s'). Deliberately NOT a strip-all-separators
    substring check: that matched across word boundaries ('xbox
    videos' → 'xboxvideos' ⊃ 'xvideos') and silently dropped
    legitimate pages (review finding r2)."""
    def scored(col) -> "F.Column":
        leet = fold_leet(col)
        collapsed = fold_obfuscation(col)  # leet fold + repeat collapse
        cond = F.lit(False)
        for kw in SEVERE_TERMS:
            cond = cond | collapsed.contains(kw) | leet.rlike(_spaced_term_re(kw))
        if threshold == "moderate":
            for kw in MODERATE_TERMS:
                # on the UNcollapsed fold: 'xxx' must stay matchable
                cond = cond | leet.rlike(rf"\b{kw}")
        return cond

    cond = scored(url_col)
    if text_col is not None:
        cond = cond | scored(text_col)
    return cond


def extract_links(html: str) -> list[str]:
    """All a[href] values in document order (duplicates kept) — F3."""
    root = _parse_html(html)
    out: list[str] = []
    work: list[_Element] = [root]
    while work:
        el = work.pop(0)
        if el.tag == "a" and "href" in el.attrs:
            out.append(el.attrs["href"])
        work = [c for c in el.children if isinstance(c, _Element)] + work
    return out


def normalize_url(url: str) -> str:
    """F10: strip fragment; drop utm*/id/t query pairs; force https."""
    p = urlparse(url)
    pairs = [
        (k, v)
        for k, v in parse_qsl(p.query, keep_blank_values=True)
        if "utm" not in k and k not in ("id", "t")
    ]
    q = f"?{urlencode(pairs)}" if pairs else ""
    return f"https://{p.netloc}{p.path}{q}"


def resolve_url(base: str, href: str) -> str:
    """F11: relative href against the page url."""
    return urljoin(base, href)


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: extract_links(_decode(b)))


@pandas_udf(StringType())
def normalize_url_udf(url: pd.Series) -> pd.Series:
    return url.map(normalize_url)


@pandas_udf(StringType())
def resolve_url_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    return pd.Series([resolve_url(b, h) for b, h in zip(base, href)])


def blocked_url(url_col) -> "F.Column":
    """F9 policy predicate over the url alone (frontier pre-filter):
    the plain keyword set PLUS the obfuscation-robust severe matcher —
    a queued url is rejected before it is ever fetched."""
    cond = inappropriate(url_col)
    for kw in sorted(BLOCKED_KEYWORDS):
        cond = cond | F.lower(url_col).contains(kw)
    return cond


def is_english_html(html: str) -> bool:
    """F8 at crawl time — reference UrlHandler::is_english
    (url_handler.rs:29-42): true iff ANY `html` element carries a
    `lang` attribute starting with "en" (case-sensitive, exactly as the
    Rust `starts_with`; `lang="EN"` does NOT pass, quirk-exact)."""
    root = _parse_html(html)
    work: list[_Element] = [root]
    while work:
        el = work.pop()
        if el.tag == "html" and el.attrs.get("lang", "").startswith("en"):
            return True
        work.extend(c for c in el.children if isinstance(c, _Element))
    return False


@pandas_udf(BooleanType())
def is_english_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: is_english_html(_decode(b)))


def crawl_frontier(pages: DataFrame, visited: DataFrame | None = None) -> DataFrame:
    """pages(url, html) → deduped, normalized, policy-filtered frontier
    of outgoing links (the K1 queued-URL sink relation).

    Plan shape at scale: one narrow UDF pass (links), explode, two
    cheap UDFs, then a single dropDuplicates shuffle on the normalized
    url; `visited` (the crawled-set, S5) is removed with a left-anti
    join — broadcast when small, shuffle otherwise.
    """
    links = pages.select(
        F.col("url").alias("base"),
        F.explode(extract_links_udf(F.col("html"))).alias("href"),
    )
    frontier = (
        links.select(
            normalize_url_udf(resolve_url_udf(F.col("base"), F.col("href"))).alias("url")
        )
        .filter(~blocked_url(F.col("url")))
        .dropDuplicates(["url"])
    )
    if visited is not None:
        frontier = frontier.join(
            visited.select("url"), "url", "left_anti"
        )
    return frontier
