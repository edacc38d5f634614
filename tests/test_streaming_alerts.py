"""Streaming percolation (streaming/alerts.py).

Property: alerts accumulated over any sequence of drains equal the
one-shot batch percolation over the union of the files; a drain with
no new files fires nothing new; the pre-first-drain log is empty with
the right schema."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.operators.percolate import percolate
from search_engine_spark.streaming.alerts import percolate_stream, read_alerts

WS = lambda c: F.split(c, " ")


def _queries(spark):
    return spark.createDataFrame(
        [(0, "spark"), (1, "spark"), (1, "merge")],
        "query_id int, term string",
    )


def _alert_set(df):
    return {
        (r["doc_id"], r["query_id"], r["n_matched"]) for r in df.collect()
    }


def test_stream_alerts_equal_batch_percolation(spark, tmp_path):
    inp = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    sq = _queries(spark)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    part_a = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    part_b = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")

    assert read_alerts(spark, state).count() == 0  # schema-only pre-drain

    part_a.write.parquet(f"{inp}/drop_a")
    got1 = percolate_stream(
        spark, f"{inp}/drop_*", sq, state, mode="and", tokenizer=WS
    )
    want_a = percolate(part_a, sq, mode="and", tokenizer=WS)
    assert _alert_set(got1) == _alert_set(want_a)

    # second drop: alerts ACCUMULATE to the batch result over A+B;
    # A's files are not re-percolated (checkpoint skips them)
    part_b.write.parquet(f"{inp}/drop_b")
    got2 = percolate_stream(
        spark, f"{inp}/drop_*", sq, state, mode="and", tokenizer=WS
    )
    want_ab = percolate(
        part_a.unionByName(part_b), sq, mode="and", tokenizer=WS
    )
    assert _alert_set(got2) == _alert_set(want_ab)

    # idle drain: nothing new fires, log unchanged
    got3 = percolate_stream(
        spark, f"{inp}/drop_*", sq, state, mode="and", tokenizer=WS
    )
    assert _alert_set(got3) == _alert_set(got2)
