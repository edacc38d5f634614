"""Standing-query percolation (operators/percolate.py): AND/OR
semantics, duplicate tolerance, vocabulary isolation. Oracle value
parity at sf0.01 runs in test_entry_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.percolate import percolate


@pytest.fixture(scope="module")
def batch(spark):
    return spark.createDataFrame(
        [
            (1, "spark merge spark"),
            (2, "merge batch"),
            (3, "quiet unrelated words"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def queries(spark):
    # q10: single term; q11: two terms; q12: term absent everywhere;
    # q13 has a duplicated term row — must count once
    return spark.createDataFrame(
        [
            (10, "spark"),
            (11, "spark"),
            (11, "merge"),
            (12, "zzznope"),
            (13, "batch"),
            (13, "batch"),
        ],
        "query_id int, term string",
    )


WS = lambda c: F.split(c, " ")


def test_percolate_and_requires_every_term(spark, batch, queries):
    out = {
        (r["doc_id"], r["query_id"])
        for r in percolate(batch, queries, mode="and", tokenizer=WS).collect()
    }
    # doc1 has spark+merge → fires q10, q11; doc2 fires q11? no — doc2
    # lacks 'spark'; doc2 fires q13; nothing fires q12
    assert out == {(1, 10), (1, 11), (2, 13)}


def test_percolate_or_reports_overlap_counts(spark, batch, queries):
    rows = percolate(batch, queries, mode="or", tokenizer=WS).collect()
    got = {(r["doc_id"], r["query_id"]): r["n_matched"] for r in rows}
    assert got == {
        (1, 10): 1,
        (1, 11): 2,
        (2, 11): 1,  # partial overlap fires in OR mode
        (2, 13): 1,
    }


def test_percolate_duplicate_doc_terms_count_once(spark, queries):
    doc = spark.createDataFrame(
        [(7, "batch batch batch")], "doc_id long, text string"
    )
    rows = percolate(doc, queries, mode="and", tokenizer=WS).collect()
    assert [(r["doc_id"], r["query_id"], r["n_matched"]) for r in rows] == [
        (7, 13, 1)
    ]


def test_percolate_rejects_unknown_mode(spark, batch, queries):
    with pytest.raises(ValueError):
        percolate(batch, queries, mode="xor", tokenizer=WS)
