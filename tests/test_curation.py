"""Edge-case tests for the curation operators (repetition gates, PII
scrubbing, sequence packing, k-means clustering) — the oracle parity
sweep lives in test_entry_oracle.py; these pin the boundary semantics.
"""

from __future__ import annotations

import pytest

from search_engine_spark.operators.curation import (
    pack_sequences,
    pii_scrub,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestRepetitionStats:
    def test_short_docs_have_zero_higher_gram_fracs(self, spark):
        df = _docs(spark, [(1, "s", "solo"), (2, "s", "two words")])
        out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
        assert out[1]["n_tokens"] == 1
        assert out[1]["top_unigram_frac"] == 1.0
        assert out[1]["top_bigram_frac"] == 0.0
        assert out[1]["top_trigram_frac"] == 0.0
        assert out[2]["top_bigram_frac"] == 1.0  # the single bigram
        assert out[2]["top_trigram_frac"] == 0.0

    def test_fully_repeated_doc_maxes_every_signal(self, spark):
        df = _docs(spark, [(1, "s", "spam spam spam spam")])
        r = repetition_stats(df).collect()[0]
        assert r["n_tokens"] == 4
        assert r["unique_frac"] == 0.25
        assert r["top_unigram_frac"] == 1.0
        assert r["top_bigram_frac"] == 1.0  # 'spam spam' x3 of 3
        assert r["top_trigram_frac"] == 1.0

    def test_distinct_doc_fracs(self, spark):
        df = _docs(spark, [(1, "s", "a b c d")])
        r = repetition_stats(df).collect()[0]
        assert r["unique_frac"] == 1.0
        assert r["top_unigram_frac"] == 0.25
        assert r["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-6)
        assert r["top_trigram_frac"] == 0.5

    def test_double_spaces_do_not_mint_empty_tokens(self, spark):
        df = _docs(spark, [(1, "s", "a  b")])
        r = repetition_stats(df).collect()[0]
        assert r["n_tokens"] == 2


class TestPiiScrub:
    def test_all_three_kinds(self, spark):
        df = _docs(
            spark,
            [(1, "s", "mail bob@example.com from 10.0.0.1 call +1 415-555-0199 now")],
        )
        r = pii_scrub(df).collect()[0]
        assert (r["n_email"], r["n_ip"], r["n_phone"]) == (1, 1, 1)
        assert r["clean_text"] == "mail <EMAIL> from <IP> call <PHONE> now"

    def test_ip_not_double_counted_as_phone(self, spark):
        # 10.0.0.1 redacts as <IP> first; the phone rule must not see it
        df = _docs(spark, [(1, "s", "server 192.168.100.200 is up")])
        r = pii_scrub(df).collect()[0]
        assert r["n_ip"] == 1
        assert r["n_phone"] == 0
        assert "<IP>" in r["clean_text"]

    def test_clean_doc_passes_through(self, spark):
        df = _docs(spark, [(1, "s", "nothing sensitive here at all")])
        r = pii_scrub(df).collect()[0]
        assert (r["n_email"], r["n_ip"], r["n_phone"]) == (0, 0, 0)
        assert r["clean_text"] == "nothing sensitive here at all"

    def test_plain_prose_numbers_survive(self, spark):
        # short digit runs (years, counts) are not phone-shaped
        df = _docs(spark, [(1, "s", "in 2024 we shipped 15 releases")])
        r = pii_scrub(df).collect()[0]
        assert r["n_phone"] == 0
        assert r["clean_text"] == "in 2024 we shipped 15 releases"


class TestPackSequences:
    def test_exact_boundary_starts_new_sequence(self, spark):
        # doc 1: 4 tokens -> seq 0 offset 0; doc 2 starts at 4 == capacity
        df = _docs(spark, [(1, "s", "a b c d"), (2, "s", "e f")])
        out = {r["doc_id"]: r for r in pack_sequences(df, capacity=4).collect()}
        assert (out[1]["seq_id"], out[1]["offset"]) == (0, 0)
        assert (out[2]["seq_id"], out[2]["offset"]) == (1, 0)

    def test_straddling_doc_is_assigned_where_it_starts(self, spark):
        df = _docs(spark, [(1, "s", "a b c"), (2, "s", "d e f g")])
        out = {r["doc_id"]: r for r in pack_sequences(df, capacity=4).collect()}
        assert (out[2]["seq_id"], out[2]["offset"]) == (0, 3)

    def test_sources_pack_independently(self, spark):
        df = _docs(spark, [(1, "x", "a b c d"), (2, "y", "e f")])
        out = {r["doc_id"]: r for r in pack_sequences(df, capacity=4).collect()}
        assert (out[2]["seq_id"], out[2]["offset"]) == (0, 0)

    def test_order_is_doc_id_not_input_order(self, spark):
        df = _docs(spark, [(2, "s", "c d"), (1, "s", "a b")])
        out = {r["doc_id"]: r for r in pack_sequences(df, capacity=10).collect()}
        assert out[1]["offset"] == 0
        assert out[2]["offset"] == 2


class TestKmeans:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def test_deterministic_and_total(self, emb):
        from search_engine_spark.operators.similarity import kmeans_clusters

        a = sorted(map(tuple, kmeans_clusters(emb, k=4, iters=1).collect()))
        b = sorted(map(tuple, kmeans_clusters(emb, k=4, iters=1).collect()))
        assert a == b
        assert len(a) == emb.count()
        cells = {c for _, c, _ in a}
        assert cells <= set(range(4))
        assert all(d2 >= 0 for _, _, d2 in a)

    def test_iterations_do_not_increase_distortion(self, emb):
        from search_engine_spark.operators.similarity import kmeans_clusters

        def distortion(iters):
            rows = kmeans_clusters(emb, k=8, iters=iters).collect()
            return sum(r["d2"] for r in rows)

        d1, d2 = distortion(1), distortion(2)
        assert d2 <= d1 + 1e-6  # Lloyd monotonicity (up to 6dp rounding)


class TestGopherFilter:
    def test_gates_drop_the_right_docs(self, spark):
        from search_engine_spark.operators.curation import gopher_filter

        diverse = " ".join(f"w{i}" for i in range(40))
        spammy = " ".join(["spam"] * 40)
        short = "too short"
        df = _docs(spark, [(1, "s", diverse), (2, "s", spammy), (3, "s", short)])
        kept = {r["doc_id"] for r in gopher_filter(df).collect()}
        assert kept == {1}

    def test_thresholds_are_tunable(self, spark):
        from search_engine_spark.operators.curation import gopher_filter

        # 12 distinct tokens: every top-gram frac sits at/below its cap,
        # so only the length gate decides
        short = " ".join(f"t{i}" for i in range(12))
        df = _docs(spark, [(1, "s", short)])
        assert gopher_filter(df).count() == 0  # min_tokens=20 default
        assert gopher_filter(df, min_tokens=12).count() == 1


class TestMaterializeSequences:
    def test_stream_cut_at_capacity(self, spark):
        from search_engine_spark.operators.curation import materialize_sequences

        df = _docs(spark, [(1, "s", "a b c"), (2, "s", "d e f g")])
        out = {(r["source"], r["seq_id"]): r for r in
               materialize_sequences(df, capacity=4).collect()}
        assert out[("s", 0)]["seq_text"] == "a b c d"
        assert out[("s", 0)]["n_tokens"] == 4
        assert out[("s", 1)]["seq_text"] == "e f g"  # final short seq
        assert out[("s", 1)]["n_tokens"] == 3

    def test_consistent_with_pack_sequences(self, spark):
        from search_engine_spark.operators.curation import (
            materialize_sequences,
            pack_sequences,
        )

        rows = [(i, f"s{i % 3}", " ".join(f"w{i}_{j}" for j in range(i % 7 + 1)))
                for i in range(30)]
        df = _docs(spark, rows)
        mat = materialize_sequences(df, capacity=8).collect()
        idx = pack_sequences(df, capacity=8).collect()
        # every doc's first token appears at its pack_sequences offset
        seq_toks = {(r["source"], r["seq_id"]): r["seq_text"].split(" ")
                    for r in mat}
        for r in idx:
            first = f"w{r['doc_id']}_0"
            assert seq_toks[(r["source"], r["seq_id"])][r["offset"]] == first
        # total token volume conserved
        assert sum(r["n_tokens"] for r in mat) == sum(r["n_tokens"] for r in idx)

    def test_sources_independent(self, spark):
        from search_engine_spark.operators.curation import materialize_sequences

        df = _docs(spark, [(1, "x", "a b"), (2, "y", "c d")])
        out = {r["source"]: r for r in
               materialize_sequences(df, capacity=4).collect()}
        assert out["x"]["seq_text"] == "a b"
        assert out["y"]["seq_text"] == "c d"


def test_distill_gate_learns_to_separate(spark):
    """The distilled logistic scorer must order gate-passing docs above
    failing ones on average, and more GD steps must not hurt the
    separation (full-batch GD on a separable-ish rule)."""
    from search_engine_spark.operators.curation import distill_gate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w2, s2 = distill_gate(docs, iters=2)
    w10, s10 = distill_gate(docs, iters=10)
    assert len(w10) == 4 and any(abs(x) > 0 for x in w10)

    def sep(scores):
        rows = scores.collect()
        pos = [r["p"] for r in rows if r["y"] == 1]
        neg = [r["p"] for r in rows if r["y"] == 0]
        assert pos and neg
        return sum(pos) / len(pos) - sum(neg) / len(neg)

    g2, g10 = sep(s2), sep(s10)
    assert g10 > 0  # positives score higher
    assert g10 >= g2 - 1e-9  # training longer doesn't lose separation
