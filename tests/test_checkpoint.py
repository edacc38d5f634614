"""Checkpoint/lineage/resume (SURVEY §7.6, north-rule resumability) and
the salted skew-safe term layout (§7.5).

Kill-resume property: run checkpointed_build with max_chunks=m (kill
simulation), rerun to completion, and assert
  1. the finalized index is identical to the one-shot batch build,
  2. the parts completed before the kill kept their original run_id —
     i.e. they were NOT recomputed on resume,
  3. lineage covers every part exactly once with status ok,
  4. metrics rows carry per-chunk throughput.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from search_engine_spark.operators.checkpoint import (
    BuildInterrupted,
    checkpointed_build,
    lineage,
    metrics,
)
from search_engine_spark.operators.index_build import (
    build_index,
    prepare_docs,
    salted_by_term,
    write_index,
)
from search_engine_spark.sources.corpus import synth_pages

N_PAGES = 200
N_PARTS = 8


@pytest.fixture(scope="module")
def docs(spark):
    pages = synth_pages(spark, N_PAGES, seed=7)
    d = prepare_docs(pages, id_method="hash").cache()
    d.count()
    return d


def _postings_set(index):
    return {
        (r["term"], r["doc_id"], r["tf"])
        for r in index.postings.select("term", "doc_id", "tf").collect()
    }


def test_kill_then_resume_identical_and_no_recompute(spark, docs, tmp_path):
    path = str(tmp_path / "ckpt")

    with pytest.raises(BuildInterrupted):
        checkpointed_build(
            docs, path, num_parts=N_PARTS, chunk_size=2, max_chunks=2
        )

    lin1 = lineage(spark, path).collect()
    done_first = {int(r["part"]): r["run_id"] for r in lin1 if r["status"] == "ok"}
    assert 0 < len(done_first) < N_PARTS  # genuinely partial

    index = checkpointed_build(docs, path, num_parts=N_PARTS, chunk_size=2)

    lin2 = lineage(spark, path).collect()
    by_part = {}
    for r in lin2:
        by_part.setdefault(int(r["part"]), []).append(r)
    assert set(by_part) == set(range(N_PARTS))
    for p, rows in by_part.items():
        assert len(rows) == 1, f"part {p} has {len(rows)} lineage rows (recomputed?)"
    # parts finished before the kill kept the first run's id → not recomputed
    run_ids = {p: rows[0]["run_id"] for p, rows in by_part.items()}
    for p, rid in done_first.items():
        assert run_ids[p] == rid, f"part {p} was recomputed on resume"
    assert len({rid for rid in run_ids.values()}) == 2  # two runs participated

    direct = build_index(docs)
    assert _postings_set(index) == _postings_set(direct)
    assert index.n_docs == direct.n_docs
    assert index.avgdl == pytest.approx(direct.avgdl, rel=1e-12)

    m = metrics(spark, path).collect()
    assert len(m) >= 2
    for r in m:
        assert r["docs_per_sec"] > 0 and r["postings_out"] > 0


def test_resume_on_complete_state_is_noop(spark, docs, tmp_path):
    path = str(tmp_path / "ckpt2")
    checkpointed_build(docs, path, num_parts=4, chunk_size=4)
    lin1 = {(int(r["part"]), r["run_id"]) for r in lineage(spark, path).collect()}
    checkpointed_build(docs, path, num_parts=4, chunk_size=4)
    lin2 = {(int(r["part"]), r["run_id"]) for r in lineage(spark, path).collect()}
    assert lin1 == lin2  # nothing recomputed, no new lineage


def test_salted_layout_preserves_content(spark, docs, tmp_path):
    index = build_index(docs)
    plain = str(tmp_path / "plain")
    salted = str(tmp_path / "salted")
    write_index(index, plain)
    # threshold 0 → every term is a head term (max salting)
    write_index(index, salted, salt_df_threshold=0, num_salts=4)
    a = {
        tuple(r)
        for r in spark.read.parquet(f"{plain}/postings")
        .select("term", "doc_id", "tf")
        .collect()
    }
    b = {
        tuple(r)
        for r in spark.read.parquet(f"{salted}/postings")
        .select("term", "doc_id", "tf")
        .collect()
    }
    assert a == b


def test_salted_spreads_head_terms(spark, docs):
    """The salted shuffle KEY (term, salt) must fan a head term's
    postings over >1 distinct key — i.e. >1 reducer at scale. (We assert
    on keys, not spark_partition_id: AQE rightly coalesces this tiny
    test shuffle to one partition, which says nothing about the key
    distribution that governs reducers on a real cluster.)"""
    index = build_index(docs)
    head = index.term_stats.orderBy(F.col("df").desc()).limit(1).collect()[0]["term"]
    n_salts = (
        index.postings.filter(F.col("term") == head)
        .select(F.pmod(F.xxhash64("doc_id"), F.lit(4)).alias("salt"))
        .distinct()
        .count()
    )
    assert n_salts > 1, f"head term {head!r} maps to a single (term, salt) key"


def test_changed_input_restages_and_rebuilds(spark, tmp_path):
    """Adding docs after a completed build must re-stage and rebuild the
    touched partitions (url-set fingerprint check)."""
    p1 = synth_pages(spark, 60, seed=3)
    d1 = prepare_docs(p1, id_method="hash")
    path = str(tmp_path / "ckpt3")
    idx1 = checkpointed_build(d1, path, num_parts=4, chunk_size=4)
    n1 = idx1.n_docs

    p2 = synth_pages(spark, 90, seed=3)  # superset: 30 new pages
    d2 = prepare_docs(p2, id_method="hash")
    idx2 = checkpointed_build(d2, path, num_parts=4, chunk_size=4)
    direct = build_index(d2)
    assert idx2.n_docs == direct.n_docs > n1
    assert {
        (r["term"], r["doc_id"], r["tf"])
        for r in idx2.postings.select("term", "doc_id", "tf").collect()
    } == {
        (r["term"], r["doc_id"], r["tf"])
        for r in direct.postings.select("term", "doc_id", "tf").collect()
    }


def test_shrinking_input_drops_emptied_part(spark, tmp_path):
    """A part whose docs ALL disappear from the input must not leak its
    stale docs into the resumed build (r1 advisory: finalize used every
    lineage-ok part, and the staged write under dynamic overwrite kept
    the emptied part's dir)."""
    p1 = synth_pages(spark, 80, seed=11)
    d1 = prepare_docs(p1, id_method="hash")
    path = str(tmp_path / "ckpt4")
    idx1 = checkpointed_build(d1, path, num_parts=4, chunk_size=4)
    n1 = idx1.n_docs

    # drop every url hashing into part 0 — that part becomes empty
    keep = d1.filter(F.pmod(F.xxhash64("url"), F.lit(4)).cast("int") != 0)
    n_dropped = d1.count() - keep.count()
    assert n_dropped > 0, "seed must place some urls in part 0"

    idx2 = checkpointed_build(keep, path, num_parts=4, chunk_size=4)
    direct = build_index(keep)
    assert idx2.n_docs == direct.n_docs == n1 - n_dropped
    assert _postings_set(idx2) == _postings_set(direct)


def test_reference_rows_round_trip(spark, docs):
    """hstore-compat export (reference terms table shape,
    migrations/06_create_terms_table.sql): engine → reference rows →
    engine must reproduce identical postings and stats."""
    from search_engine_spark.operators.index_build import (
        from_reference_rows,
        to_reference_rows,
    )

    index = build_index(docs)
    rows = to_reference_rows(index)
    # shape: one row per term, maps keyed by page id strings
    sample = rows.limit(5).collect()
    assert {c for c in rows.columns} == {
        "term", "idf", "page_frequency", "tf_scores", "tf_idf_scores"
    }
    for r in sample:
        assert set(r["tf_scores"]) == set(r["tf_idf_scores"])
        assert r["page_frequency"] == len(r["tf_scores"])

    back = from_reference_rows(rows)
    assert back.n_docs == index.n_docs
    assert back.avgdl == pytest.approx(index.avgdl, rel=1e-12)
    assert _postings_set(back) == _postings_set(index)


def test_auto_salting_spreads_zipf_head(spark, tmp_path):
    """write_index's default 'auto' threshold must measure df and spread
    a Zipf head term's postings over multiple files, with read results
    unchanged vs the plain layout (r1 advisory: salting existed but
    nothing flipped it on)."""
    from search_engine_spark.operators.index_build import auto_salt_threshold
    from search_engine_spark.operators.text_analytics import ws_tokens

    # 120 docs; "zipfhead" in every doc (df=120), tail terms df=1
    rows = [(i, f"zipfhead zipfhead tail{i} only{i}") for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    index = build_index(docs, tokenizer=ws_tokens)

    thr = auto_salt_threshold(index, salt_df_floor=1)
    head_df = index.term_stats.filter(F.col("term") == "zipfhead").collect()[0]["df"]
    assert head_df > thr, "head term must cross the measured threshold"

    auto_path, plain_path = str(tmp_path / "auto"), str(tmp_path / "plain")
    # AQE rightly coalesces this tiny test shuffle into one partition,
    # which hides the file spread that governs reducers at scale —
    # disable coalescing so the physical layout is observable
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        write_index(index, auto_path, salt_df_floor=1)
        write_index(index, plain_path, salt_df_threshold=None)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    head_files = (
        spark.read.parquet(f"{auto_path}/postings")
        .filter(F.col("term") == "zipfhead")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert head_files >= 2, "head term postings still land in one file"

    a = {
        tuple(r)
        for r in spark.read.parquet(f"{auto_path}/postings")
        .select("term", "doc_id", "tf")
        .collect()
    }
    b = {
        tuple(r)
        for r in spark.read.parquet(f"{plain_path}/postings")
        .select("term", "doc_id", "tf")
        .collect()
    }
    assert a == b
