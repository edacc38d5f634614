"""BPE merge training (operators/bpe.py). Oracle value parity runs in
test_entry_oracle.py (bpe_merges / bpe_segments); here: the greedy
semantics the SQL comparison can't isolate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.operators import bpe


def test_first_merge_is_the_most_frequent_weighted_pair(spark):
    # "ab" appears in both words; "low" count-weights the 'l''o' pair
    docs = spark.createDataFrame(
        [(0, "abab low low low"), (1, "abba")],
        "doc_id long, text string",
    )
    table, _ = bpe.bpe_train(docs, merges=1)
    # pair counts: ('a','b'): abab×1 has 2 + abba×1 has 1 = 3;
    # ('l','o') = 3, ('o','w') = 3, ('b','a'): abab 1 + abba 1 = 2.
    # tie on 3 → lexicographic smallest pair wins: ('a','b')
    assert table[0][:2] == ("a", "b")
    assert table[0][2] == 3


def test_greedy_run_merges_left_to_right(spark):
    # "aaaa" + merge (a,a): greedy scan yields "aa","aa" — never the
    # overlapping middle pair; "aaa" yields "aa","a"
    docs = spark.createDataFrame(
        [(0, "aaaa aaa")], "doc_id long, text string"
    )
    table, final = bpe.bpe_train(docs, merges=1)
    assert table[0][:2] == ("a", "a")
    seg = {r["term"]: r["segmented"] for r in bpe.bpe_segment(final).collect()}
    assert seg["aaaa"] == "aa aa"
    assert seg["aaa"] == "aa a"


def test_merges_compose_into_subwords(spark):
    docs = spark.createDataFrame(
        [(0, "hugging hugging hugging bug bug")],
        "doc_id long, text string",
    )
    table, final = bpe.bpe_train(docs, merges=6)
    seg = {r["term"]: r["segmented"] for r in bpe.bpe_segment(final).collect()}
    # after 6 merges the repeated word compresses to few symbols and the
    # shared 'ug' unit shows up in both words' segmentations
    assert len(seg["hugging"].split(" ")) <= 4
    joined = " | ".join(seg.values())
    assert "ug" in joined
    # every word reassembles exactly from its pieces
    for term, s in seg.items():
        assert s.replace(" ", "") == term


def test_bpe_token_counts_shrink_with_merges(spark):
    """Each merge can only reduce a word's piece count, so learned-BPE
    token counts are <= character counts and decrease (weakly) with
    more merges; zero merges means one piece per character."""
    docs = spark.createDataFrame(
        [(0, "hugging hugging bug"), (1, "bug bug")],
        "doc_id long, text string",
    )
    _, s0 = bpe.bpe_train(docs, merges=0)
    _, s6 = bpe.bpe_train(docs, merges=6)
    c0 = {r["doc_id"]: r["n_bpe_tokens"]
          for r in bpe.bpe_token_counts(docs, s0).collect()}
    c6 = {r["doc_id"]: r["n_bpe_tokens"]
          for r in bpe.bpe_token_counts(docs, s6).collect()}
    assert c0 == {0: len("hugging") * 2 + len("bug"), 1: len("bug") * 2}
    assert all(c6[d] <= c0[d] for d in c0)
    assert c6[1] < c0[1]  # 'bug' really compressed
