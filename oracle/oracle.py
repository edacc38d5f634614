"""Single-node reference implementation (the rank/score oracle).

Implements the IDENTICAL extraction/tokenization (imported from the
engine — byte-identity by construction, per BASELINE.json input_hint)
and the closed-form batch index the reference's incremental loop
converges to (SURVEY §5.2: the golden fixtures equal tf_raw ×
log10(N/df)).

Two scorers:
- tfidf_compat: the reference's ranking function
  ``SUM(tf·idf) * COUNT(matched term)`` with f32 rounding
  (app/main.py:69-71, quirks Q5/Q7/Q9 — OR semantics, f32 scores,
  tie-break (score DESC, doc_id ASC)).
- bm25: Lucene-style BM25 (quirk Q11): idf = ln(1+(N-df+0.5)/(df+0.5)),
  tf_norm = tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)), k1=1.2, b=0.75.

Per-doc score = sum over the doc's matched query terms, accumulated in
f64 over per-term values (compat: per-term value first rounded to f32,
final sum rounded to f32) — the same deterministic contract the Spark
engine implements, so scores are comparable to the last bit.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from search_engine_spark.functions.textproc import (
    extract_text,
    tokenize,
    tokenize_query,
)

K1 = 1.2
B = 0.75


def f32(x: float) -> float:
    """Round-trip through IEEE float32 (numpy-free)."""
    import struct

    return struct.unpack("f", struct.pack("f", x))[0]


def ref_idf(n: int, df: int) -> float:
    """log10(N/df), 0-guarded (tf-idf-indexer/src/lib.rs:190-199), f32."""
    if n == 0 or df == 0:
        return 0.0
    return f32(math.log10(n / df))


def bm25_idf(n: int, df: int) -> float:
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


@dataclass
class OracleIndex:
    n_docs: int = 0
    # term -> {doc_id: tf}
    postings: dict[str, dict[int, int]] = field(default_factory=dict)
    # doc_id -> dl (token count post stop-filter, incl. "" terms)
    doc_len: dict[int, int] = field(default_factory=dict)

    # -- derived ----------------------------------------------------------
    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf(self, term: str) -> float:
        return ref_idf(self.n_docs, self.df(term))

    def tf_idf(self, term: str, doc_id: int) -> float:
        tf = self.postings.get(term, {}).get(doc_id, 0)
        return f32(tf * self.idf(term))

    @property
    def avgdl(self) -> float:
        return sum(self.doc_len.values()) / len(self.doc_len) if self.doc_len else 0.0


def build_index(pages: list[tuple[int, str]], *, html: bool = True) -> OracleIndex:
    """pages = [(doc_id, html-or-text)]; html=True runs extraction first."""
    idx = OracleIndex()
    for doc_id, content in pages:
        text = extract_text(content) if html else content
        toks = tokenize(text)
        idx.n_docs += 1
        idx.doc_len[doc_id] = len(toks)
        for term, tf in Counter(toks).items():
            idx.postings.setdefault(term, {})[doc_id] = tf
    return idx


def _topk(scores: dict[int, float], k: int) -> list[tuple[int, float]]:
    """(score DESC, doc_id ASC) — quirk Q7 tie-break."""
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def search_tfidf_compat(idx: OracleIndex, q: str, k: int = 10) -> list[tuple[int, float]]:
    """Reference ranking: SUM(tf_idf) * COUNT(matched term), f32 (Q5/Q9).

    Duplicate query terms are dropped: `term = ANY(array)` is a row
    FILTER on the terms table (app/main.py:67), so a term row matches
    once however often the query repeats it."""
    terms = list(dict.fromkeys(tokenize_query(q)))
    acc: dict[int, list[float]] = {}
    for t in terms:
        for doc_id in idx.postings.get(t, {}):
            acc.setdefault(doc_id, []).append(idx.tf_idf(t, doc_id))
    scores = {d: f32(math.fsum(v) * len(v)) for d, v in acc.items()}
    return _topk(scores, k)


def bm25_term_doc(idx: OracleIndex, term: str, doc_id: int) -> float:
    tf = idx.postings.get(term, {}).get(doc_id, 0)
    if tf == 0:
        return 0.0
    dl = idx.doc_len[doc_id]
    tf_norm = tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / idx.avgdl))
    return bm25_idf(idx.n_docs, idx.df(term)) * tf_norm


def search_bm25(idx: OracleIndex, q: str, k: int = 10) -> list[tuple[int, float]]:
    # duplicate query terms dropped — same ANY-filter semantics as above
    terms = list(dict.fromkeys(tokenize_query(q)))
    acc: dict[int, list[float]] = {}
    for t in terms:
        for doc_id in idx.postings.get(t, {}):
            acc.setdefault(doc_id, []).append(bm25_term_doc(idx, t, doc_id))
    scores = {d: math.fsum(v) for d, v in acc.items()}
    return _topk(scores, k)
