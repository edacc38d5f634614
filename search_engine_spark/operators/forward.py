"""Forward index (doc values): doc-partitioned postings for doc-id
point lookups.

The inverted index's term-partitioned layout makes TERM lookups a
pruned scan — and doc_id lookups a full-index scan (every posting list
contains arbitrary doc_ids; the rm3_expand docstring documents exactly
this trap). Real engines therefore keep BOTH orientations: Lucene's
doc values / stored fields next to its postings. This module is that
second orientation — the same (doc_id, term, tf) relation laid out
repartitioned by doc_id and sorted (doc_id, term) within files, so
parquet min/max row-group statistics prune doc point lookups the same
way the term layout prunes term seeks.

What it serves:
- termvectors (the Elasticsearch _termvectors API): a document's terms
  with tf, df, idf — "why does this doc score the way it does".
- feedback-doc reads (RM3, more-like-this) without re-tokenizing text.
- any per-document feature extraction keyed by doc_id.

Plan shapes: write is one repartition+sort (same cost class as
write_index). termvectors probes with an isin that reaches
PushedFilters (plan-asserted), then joins the probe rows — a few
hundred — BROADCAST against the vocabulary-sized term dimension: the
big side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import InvertedIndex

__all__ = ["write_forward_index", "read_forward_index", "termvectors"]


def write_forward_index(index: InvertedIndex, path: str) -> None:
    """Materialize (doc_id, term, tf) doc-partitioned + doc-sorted,
    plus the term dimension (term, df, idf) alongside so a reader
    needs no live InvertedIndex."""
    from search_engine_spark.catalog import write_table

    fwd = (
        index.postings.select("doc_id", "term", "tf")
        .repartition("doc_id")
        .sortWithinPartitions("doc_id", "term")
    )
    write_table(fwd, f"{path}/docterms")
    write_table(
        index.term_stats.select("term", "df", "idf"), f"{path}/term_dim"
    )


def read_forward_index(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    from search_engine_spark.catalog import read_table

    return {
        "docterms": read_table(spark, f"{path}/docterms"),
        "term_dim": read_table(spark, f"{path}/term_dim"),
    }


def termvectors(
    docterms: DataFrame,
    term_dim: DataFrame,
    doc_ids: list[int],
    round_dp: int = 6,
) -> DataFrame:
    """(doc_id, term, tf, df, idf): the requested documents' term
    vectors with corpus statistics attached — idf rounded for exact
    replay. The doc_id isin prunes the docterms scan; the surviving
    probe rows broadcast into the term-dimension join."""
    probe = docterms.filter(F.col("doc_id").isin([int(d) for d in doc_ids]))
    return (
        F.broadcast(probe)
        .join(term_dim, "term")
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round("idf", round_dp).alias("idf"),
        )
    )
