"""Round-3 corpus ops: incremental dedup against a materialized index,
deterministic hash-split sampling, vocabulary head, source mixture."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import dedup, pipelines
from search_engine_spark.operators import text_analytics as ta

DOC_SCHEMA = "doc_id long, text string, lang string, source string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


# ---------------------------------------------------------------------------
# incremental dedup
# ---------------------------------------------------------------------------

CLUSTER_A = "the quick brown fox jumps over the lazy dog again and again " * 4
CLUSTER_B = "pack my box with five dozen liquor jugs every single day now " * 4
UNIQUE = [
    "completely unrelated text about alpha beta gamma delta epsilon zeta",
    "another standalone document mentioning rivers mountains valleys plains",
]


@pytest.fixture(scope="module")
def corpus_index(spark, tmp_path_factory):
    """Corpus = two near-dup clusters + singletons, index materialized."""
    rows = [
        (10, CLUSTER_A, "en", "s1"),
        (11, CLUSTER_A + " tail one", "en", "s1"),
        (12, CLUSTER_A + " tail two", "en", "s2"),
        (20, CLUSTER_B, "en", "s2"),
        (21, CLUSTER_B + " small change", "en", "s1"),
        (30, UNIQUE[0], "en", "s1"),
        (31, UNIQUE[1], "en", "s2"),
    ]
    corpus = _docs(spark, rows)
    path = str(tmp_path_factory.mktemp("dedup_idx"))
    dedup.build_dedup_index(corpus, path, family="portable")
    buckets, labels = dedup.load_dedup_index(spark, path)
    return corpus, buckets, labels


def test_build_dedup_index_labels_match_batch_dedup(spark, corpus_index):
    corpus, _, labels = corpus_index
    got = {r["doc_id"]: r["keep_id"] for r in labels.collect()}
    want = {
        r["doc_id"]: r["keep_id"]
        for r in dedup.minhash_dedup(corpus, family="portable").collect()
    }
    assert got == want
    assert got[11] == 10 and got[12] == 10 and got[21] == 20
    assert got[30] == 30 and got[31] == 31


def test_incremental_batch_joins_existing_cluster(spark, corpus_index):
    _, buckets, labels = corpus_index
    batch = _docs(
        spark,
        [
            (100, CLUSTER_A + " tail three", "en", "s3"),  # joins cluster A
            (101, UNIQUE[0] + " slightly", "en", "s3"),  # joins doc 30
            (102, "totally fresh content about quarks and leptons", "en", "s3"),
        ],
    )
    out = {
        r["doc_id"]: r["keep_id"]
        for r in dedup.minhash_dedup_incremental(
            buckets, labels, batch, family="portable"
        ).collect()
    }
    assert set(out) == {100, 101, 102}  # batch rows only
    assert out[100] == 10  # inherits the cluster representative
    assert out[101] == 30
    assert out[102] == 102  # novel doc labels itself


def test_incremental_batch_batch_chain_resolves(spark, corpus_index):
    _, buckets, labels = corpus_index
    novel = "fresh paragraph about glaciers fjords tundra moraine ice sheets " * 4
    batch = _docs(
        spark,
        [
            (201, novel + " v1", "en", "s3"),
            (202, novel + " v2", "en", "s3"),
            (203, novel + " v3", "en", "s3"),
        ],
    )
    out = {
        r["doc_id"]: r["keep_id"]
        for r in dedup.minhash_dedup_incremental(
            buckets, labels, batch, family="portable"
        ).collect()
    }
    assert out == {201: 201, 202: 201, 203: 201}


def test_incremental_empty_text_doc_labels_itself(spark, corpus_index):
    _, buckets, labels = corpus_index
    batch = _docs(spark, [(300, "", "en", "s3"), (301, CLUSTER_B, "en", "s3")])
    out = {
        r["doc_id"]: r["keep_id"]
        for r in dedup.minhash_dedup_incremental(
            buckets, labels, batch, family="portable"
        ).collect()
    }
    assert out[300] == 300  # no tokens → no buckets → self-labeled
    assert out[301] == 20


def test_incremental_matches_full_recompute_both_families(spark):
    """On a corpus whose batch doesn't bridge two pre-existing corpus
    clusters, incremental labels equal the full-recompute restriction —
    for the portable AND the production xxhash64 family."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    for family in ("portable", "xxhash64"):
        buckets = dedup.minhash_buckets(corpus, family=family)
        labels = dedup.dedup_labels_from_buckets(buckets)
        inc = {
            r["doc_id"]: r["keep_id"]
            for r in dedup.minhash_dedup_incremental(
                buckets, labels, batch, family=family
            ).collect()
        }
        full = {
            r["doc_id"]: r["keep_id"]
            for r in dedup.minhash_dedup(docs, family=family).collect()
        }
        assert inc == {d: k for d, k in full.items() if d % 5 == 0}, family


# ---------------------------------------------------------------------------
# sample_corpus
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sf_docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_sample_deterministic_and_nested(spark, sf_docs):
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}
    s1 = ids(pipelines.sample_corpus(sf_docs, 0.2))
    s2 = ids(pipelines.sample_corpus(sf_docs, 0.2))
    s_half = ids(pipelines.sample_corpus(sf_docs, 0.5))
    assert s1 == s2  # pure function of the row
    assert s1 <= s_half  # samples nest across rates at one seed
    assert ids(pipelines.sample_corpus(sf_docs, 0.0)) == set()
    assert len(ids(pipelines.sample_corpus(sf_docs, 1.0))) == sf_docs.count()
    # rate is approximate but must be in the right ballpark at n=500
    assert 0.1 <= len(s1) / sf_docs.count() <= 0.3


def test_sample_stable_under_repartition(spark, sf_docs):
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}
    base = ids(pipelines.sample_corpus(sf_docs, 0.3, seed=7))
    shuffled = ids(pipelines.sample_corpus(sf_docs.repartition(17), 0.3, seed=7))
    assert base == shuffled


def test_sample_seed_and_family_vary_membership(spark, sf_docs):
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}
    a = ids(pipelines.sample_corpus(sf_docs, 0.3, seed=1))
    b = ids(pipelines.sample_corpus(sf_docs, 0.3, seed=2))
    assert a != b  # different seeds → different (overlapping) splits
    p = ids(pipelines.sample_corpus(sf_docs, 0.3, family="portable"))
    assert 0.1 <= len(p) / sf_docs.count() <= 0.5
    with pytest.raises(ValueError):
        pipelines.sample_corpus(sf_docs, 1.5)


def test_sample_portable_matches_python(spark, sf_docs):
    """Membership is recomputable outside Spark (the oracle contract)."""
    from search_engine_spark.operators.hashing import h64_py

    got = {
        r["doc_id"]
        for r in pipelines.sample_corpus(
            sf_docs, 0.25, seed=9, family="portable"
        ).collect()
    }
    want = {
        r["doc_id"]
        for r in sf_docs.select("doc_id").collect()
        if h64_py(f"{r['doc_id']}:9") % 1_000_000 < 250_000
    }
    assert got == want


# ---------------------------------------------------------------------------
# top_terms / source_mix
# ---------------------------------------------------------------------------


def test_top_terms_matches_counter(spark, sf_docs):
    rows = sf_docs.select("doc_id", "text").collect()
    cf: Counter = Counter()
    df_: Counter = Counter()
    for r in rows:
        toks = [t for t in r["text"].split(" ") if t]
        cf.update(toks)
        df_.update(set(toks))
    want = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["term"], r["cf"], r["df"]) for r in ta.top_terms(sf_docs, 20).collect()
    ]
    assert [(t, c, df_[t]) for t, c in want] == got


def test_source_mix_shares(spark, sf_docs):
    rows = ta.source_mix(sf_docs).collect()
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-6
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-6
    assert sum(r["n_docs"] for r in rows) == sf_docs.count()
    by_src = {r["source"]: r for r in rows}
    one = sf_docs.filter(F.col("source") == rows[0]["source"]).count()
    assert by_src[rows[0]["source"]]["n_docs"] == one


def test_unigram_logprob_matches_python(spark, sf_docs):
    import math

    rows = spark.createDataFrame(
        [
            (1, "a a b", "en", "s1"),
            (2, "a c", "en", "s1"),
            (3, "", "en", "s1"),
        ],
        DOC_SCHEMA,
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logp"])
        for r in ta.unigram_logprob(rows).collect()
    }
    # corpus counts: a=3, b=1, c=1, T=5
    p = {"a": 3 / 5, "b": 1 / 5, "c": 1 / 5}
    lg = {k: math.log10(v) for k, v in p.items()}
    want1 = round((2 * lg["a"] + lg["b"]) / 3, 6)
    want2 = round((lg["a"] + lg["c"]) / 2, 6)
    assert got == {1: (3, want1), 2: (2, want2)}  # empty doc: no tokens row
    # rare tokens score lower than common ones on the real table
    out = ta.unigram_logprob(sf_docs)
    assert out.count() == sf_docs.filter(F.length("text") > 0).count()


# ---------------------------------------------------------------------------
# ngram contamination
# ---------------------------------------------------------------------------


def test_ngram_contamination_containment(spark):
    bench_item = "what is the capital of france the answer is paris"
    page = (
        "some long web page text here " * 3
        + bench_item
        + " trailing content follows here now"
    )
    corpus = _docs(
        spark,
        [
            (1, page, "en", "s1"),  # quotes the full benchmark item
            (2, "entirely unrelated text about gardening tools", "en", "s1"),
            (3, "what is the capital of spain the answer is madrid", "en", "s1"),
        ],
    )
    probes = _docs(spark, [(100, bench_item, "en", "bench")])
    out = {
        (r["probe_id"], r["doc_id"]): (r["n_shared"], r["contamination"])
        for r in dedup.ngram_contamination(corpus, probes, n=5, threshold=0.3).collect()
    }
    # probe has 10 tokens -> 6 5-grams, all inside doc 1 => containment 1.0
    assert out[(100, 1)] == (6, 1.0)
    assert (100, 2) not in out
    # doc 3 shares no full 5-gram run ("what is the capital of" differs at 'spain')
    assert (100, 3) not in out


def test_token_shingles_short_docs_empty(spark):
    docs = _docs(spark, [(1, "a b c", "en", "s"), (2, "", "en", "s")])
    assert dedup.token_shingles(docs, n=5).count() == 0
    got = {r["g"] for r in dedup.token_shingles(docs, n=3).collect()}
    assert got == {"a b c"}


# ---------------------------------------------------------------------------
# duplicated-span scrubbing (Lee et al. 2022 style)
# ---------------------------------------------------------------------------

BOILER = "subscribe to our newsletter for daily updates"  # 7 tokens


class TestDupspanScrub:
    def test_cross_doc_span_removed_everywhere(self, spark):
        rows = [
            (1, f"alpha beta {BOILER} gamma delta", "en", "s"),
            (2, f"{BOILER} omega psi chi phi upsilon", "en", "s"),
            (3, "nothing shared with anyone here at all", "en", "s"),
        ]
        out = {r["doc_id"]: r for r in
               dedup.dupspan_scrub(_docs(spark, rows), k=5).collect()}
        assert out[1]["clean_text"] == "alpha beta gamma delta"
        assert out[1]["n_removed"] == 7
        assert out[2]["clean_text"] == "omega psi chi phi upsilon"
        assert out[3]["n_removed"] == 0
        assert out[3]["clean_text"] == rows[2][1]

    def test_within_doc_repeat_not_removed(self, spark):
        # the span repeats INSIDE doc 1 only — min_docs counts docs
        rows = [(1, f"{BOILER} x y z {BOILER}", "en", "s"),
                (2, "totally different words in this one here", "en", "s")]
        out = {r["doc_id"]: r for r in
               dedup.dupspan_scrub(_docs(spark, rows), k=5).collect()}
        assert out[1]["n_removed"] == 0

    def test_overlapping_spans_merge(self, spark):
        # docs share an 8-token run; k=5 shingles overlap — covered
        # positions must union, not double-count
        shared = "one two three four five six seven eight"
        rows = [(1, f"{shared} tail1 tail2", "en", "s"),
                (2, f"head1 head2 {shared}", "en", "s")]
        out = {r["doc_id"]: r for r in
               dedup.dupspan_scrub(_docs(spark, rows), k=5).collect()}
        assert out[1]["n_removed"] == 8
        assert out[1]["clean_text"] == "tail1 tail2"
        assert out[2]["clean_text"] == "head1 head2"

    def test_fully_scrubbed_doc_yields_empty_text(self, spark):
        rows = [(1, BOILER, "en", "s"), (2, BOILER, "en", "s")]
        out = {r["doc_id"]: r for r in
               dedup.dupspan_scrub(_docs(spark, rows), k=5).collect()}
        assert out[1]["clean_text"] == ""
        assert out[1]["n_removed"] == 7
        assert out[2]["clean_text"] == ""

    def test_short_docs_untouched(self, spark):
        rows = [(1, "tiny doc", "en", "s"), (2, "tiny doc", "en", "s")]
        out = {r["doc_id"]: r for r in
               dedup.dupspan_scrub(_docs(spark, rows), k=5).collect()}
        # shorter than k: no shingles, nothing removed (exact_dedup's job)
        assert out[1]["n_removed"] == 0
        assert out[1]["clean_text"] == "tiny doc"


def test_vocab_growth_monotone_and_total(spark):
    from search_engine_spark.operators.text_analytics import (
        tokens_df,
        vocab_growth,
    )

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "b c"), (150, "c d e"), (310, "a f")],
        ["doc_id", "text"],
    )
    out = sorted(
        vocab_growth(docs, band_size=100).collect(), key=lambda r: r["band"]
    )
    assert [(r["band"], r["new_terms"]) for r in out] == [(0, 3), (1, 2), (3, 1)]
    # cumulative is a running total ending at the full vocabulary size
    assert [r["cum_terms"] for r in out] == [3, 5, 6]
    assert out[-1]["cum_terms"] == tokens_df(docs).select("term").distinct().count()


def test_df_histogram_exact_power_of_two_bins(spark):
    from search_engine_spark.operators.text_analytics import df_histogram

    # term df values: a→4 (bin 2 boundary), b→3 (bin 1), c→1 (bin 0)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["a b", "a b", "a b c", "a"])],
        ["doc_id", "text"],
    )
    got = {r["bin"]: (r["n_terms"], r["min_df"], r["max_df"])
           for r in df_histogram(docs).collect()}
    assert got == {2: (1, 4, 4), 1: (1, 3, 3), 0: (1, 1, 1)}


def test_more_like_this_finds_lexical_neighbor(spark):
    """MLT(source) ranks the near-copy above the unrelated doc and
    never returns the source itself."""
    docs = spark.createDataFrame(
        [
            (1, "quantum flux capacitor resonance cavity alignment"),
            (2, "quantum flux capacitor resonance tuning"),
            (3, "banana bread recipe with extra walnuts and honey"),
            (4, "cavity alignment for the quantum capacitor"),
        ],
        "doc_id long, text string",
    )
    out = ta.more_like_this(docs, doc_id=1, n_terms=5, k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 1 not in ids
    assert ids[0] in (2, 4)
    assert 3 not in ids or ids.index(3) > ids.index(2)


# ---------------------------------------------------------------------------
# collocations (Dunning LLR over adjacent bigrams)
# ---------------------------------------------------------------------------


def test_llr_flags_true_collocation_over_independent_pair(spark):
    # 'hong kong' always adjacent; 'x'/'y' co-occur only at chance
    rows = [(i, "hong kong x y", "en", "s") for i in range(10)]
    rows += [(100 + i, "y x hong kong", "en", "s") for i in range(10)]
    out = {
        (r["a"], r["b"]): r["llr"]
        for r in ta.collocations_llr(_docs(spark, rows), min_count=2).collect()
    }
    assert ("hong", "kong") in out
    best = max(out, key=out.get)
    assert best == ("hong", "kong")
    assert out[("hong", "kong")] > 0


def test_llr_min_count_filters_rare_bigrams(spark):
    rows = [(1, "rare pair", "en", "s"), (2, "hong kong hong kong", "en", "s")]
    out = ta.collocations_llr(_docs(spark, rows), min_count=2).collect()
    pairs = {(r["a"], r["b"]) for r in out}
    assert ("rare", "pair") not in pairs  # count 1 < min_count


def test_llr_bigrams_do_not_cross_document_boundaries(spark):
    rows = [(1, "alpha", "en", "s"), (2, "beta gamma", "en", "s")]
    out = ta.collocations_llr(_docs(spark, rows), min_count=1).collect()
    pairs = {(r["a"], r["b"]) for r in out}
    assert ("alpha", "beta") not in pairs
    assert ("beta", "gamma") in pairs


def test_source_keyness_flags_overrepresented_terms(spark):
    rows = [(i, "common zebra", "en", "srcA") for i in range(20)]
    rows += [(100 + i, "common yak", "en", "srcB") for i in range(20)]
    out = ta.source_keyness(
        _docs(spark, rows), group_col="source", min_count=5, k=2
    ).collect()
    best = {r["source"]: r for r in out if r["llr"] == max(
        x["llr"] for x in out if x["source"] == r["source"]
    )}
    assert best["srcA"]["term"] == "zebra" and best["srcA"]["llr"] > 0
    assert best["srcB"]["term"] == "yak" and best["srcB"]["llr"] > 0
    # 'common' is evenly spread: keyness ~0, never the top key term
    common = [r for r in out if r["term"] == "common"]
    assert all(abs(r["llr"]) < best[r["source"]]["llr"] for r in common)
