"""Percolation: match incoming documents against STORED queries.

The reverse of serving — alerting/routing ("tell me when a page about
X is crawled", "route docs matching topic filters to a downstream
corpus") keeps a table of standing queries and asks, per new-document
batch, WHICH queries each document satisfies. The reference has no
analog (it only serves ad-hoc queries); every production engine ships
this as a first-class feature (saved searches / percolator / standing
alerts), and a training-data pipeline uses the same primitive to route
documents into topic-targeted corpora.

Scale shape: percolation is a term-keyed join, not a per-query scan.
The incoming batch explodes to distinct (doc_id, term) pairs once; the
standing-query table is a (query_id, term) dimension — usually small
enough that AQE broadcasts it (millions of standing queries are still
dim-sized next to a document batch), and we deliberately do NOT force
the hint so a truly huge query store degrades to a shuffle join
instead of an OOM. The AND semantics cost one (doc_id, query_id) hash
aggregate comparing matched-term counts against each query's required
count — no per-query loop, no re-scoring scan per standing query, and
the work is proportional to actual term overlaps (docs sharing no
vocabulary with any query never leave the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import raw_postings_from_docs

__all__ = ["percolate"]


def percolate(
    docs: DataFrame,
    stored_queries: DataFrame,
    mode: str = "and",
    tokenizer=None,
) -> DataFrame:
    """(doc_id, query_id, n_matched): which standing queries each doc
    in the batch satisfies.

    `stored_queries` is (query_id, term) — one row per query term
    (duplicate rows are tolerated and deduped). mode='and' fires only
    when the doc contains EVERY term of the query; mode='or' fires on
    any overlap, with n_matched reporting how many distinct query
    terms hit (the routing-priority signal).
    """
    if mode not in ("and", "or"):
        raise ValueError(mode)
    sq = stored_queries.select("query_id", "term").distinct()
    doc_terms = (
        raw_postings_from_docs(docs, tokenizer=tokenizer)
        .select("doc_id", "term")
        .distinct()
    )
    matched = doc_terms.join(sq, "term").groupBy("doc_id", "query_id").agg(
        F.count(F.lit(1)).alias("n_matched")
    )
    if mode == "or":
        return matched
    required = sq.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_required")
    )
    # same no-forced-broadcast policy as the term join: `required` is
    # query-store-sized, so the hint stays AQE's call
    return (
        matched.join(required, "query_id")
        .filter(F.col("n_matched") == F.col("n_required"))
        .select("doc_id", "query_id", "n_matched")
    )
