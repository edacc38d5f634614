"""Link-graph operators (operators/graph.py): PageRank invariants,
anchor postings, and the fused BM25·PageRank ranker. Oracle value
parity is covered by tests/test_entry_oracle.py (pagerank / anchor_tf /
bm25_pagerank_topk); these tests pin the algebraic invariants the
oracle comparison can't express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import graph as g

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def edges(docs):
    return g.synthetic_links(docs, docs.count()).persist()


def test_edges_deterministic_and_dangling(docs, edges):
    n = docs.count()
    rows = {(r["src"], r["dst"]) for r in edges.collect()}
    # rule recomputed independently
    expect = set()
    for s in range(n):
        if s % g.DANGLING_MOD == 0:
            continue
        for j in range(4):
            d = (s * g.EDGE_A + j * g.EDGE_B + g.EDGE_C) % n
            if d != s:
                expect.add((s, d))
    assert rows == expect
    # dangling docs really have no out-edges
    assert all(s % g.DANGLING_MOD != 0 for s, _ in rows)


def test_pagerank_is_a_distribution(spark, docs, edges):
    n = docs.count()
    pr = g.pagerank(docs, edges, n, iters=5)
    rows = pr.collect()
    assert len(rows) == n
    total = sum(r["pr"] for r in rows)
    assert abs(total - 1.0) < 1e-9  # mass conserved incl. dangling
    assert all(r["pr"] > 0 for r in rows)  # teleport floor
    # a floor below which no node can fall: (1-d)/n
    assert min(r["pr"] for r in rows) >= (1 - 0.85) / n - 1e-12


def test_pagerank_rewards_indegree(spark, docs, edges):
    n = docs.count()
    pr = {r["doc_id"]: r["pr"] for r in g.pagerank(docs, edges, n, iters=5).collect()}
    indeg = {
        r["dst"]: r["c"]
        for r in edges.groupBy("dst").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    top_in = max(indeg, key=indeg.get)
    low_in = min(range(n), key=lambda i: indeg.get(i, 0))
    assert indeg[top_in] > indeg.get(low_in, 0)
    assert pr[top_in] > pr[low_in]


def test_hits_unit_norm_and_indegree(spark, docs, edges):
    import math

    hv = g.hits(docs, edges, iters=3).collect()
    assert len(hv) == docs.count()
    assert math.isclose(sum(r["hub"] ** 2 for r in hv), 1.0, rel_tol=1e-9)
    assert math.isclose(sum(r["auth"] ** 2 for r in hv), 1.0, rel_tol=1e-9)
    # dangling docs (no out-edges) have zero hub score but may be authorities
    srcs = {r["src"] for r in edges.collect()}
    for r in hv:
        if r["doc_id"] not in srcs:
            assert r["hub"] == 0.0


def test_link_components_are_consistent(spark, docs, edges):
    comp = {
        r["doc_id"]: r["comp_id"]
        for r in g.link_components(docs, edges).collect()
    }
    assert set(comp) == set(range(docs.count()))
    # both endpoints of every edge agree
    for r in edges.collect():
        assert comp[r["src"]] == comp[r["dst"]]
    # each component's label is its minimum member
    members: dict[int, list[int]] = {}
    for d, c in comp.items():
        members.setdefault(c, []).append(d)
    for c, ms in members.items():
        assert c == min(ms)


def test_anchor_postings_shape(docs, edges):
    ap = g.anchor_postings(docs, edges, anchor_len=3)
    rows = ap.collect()
    assert rows
    # every anchored term is one of some source doc's first 3 tokens
    firsts = set()
    for r in docs.select("text").collect():
        firsts.update(r["text"].split(" ")[:3])
    assert {r["term"] for r in rows} <= firsts
    # counts are per (doc, term) and positive
    assert all(r["tf_anchor"] >= 1 for r in rows)
    assert ap.groupBy("doc_id", "term").count().filter("count > 1").count() == 0


def test_fused_ranker_blends_both_signals(spark, docs, edges):
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import score_bm25
    from search_engine_spark.operators.text_analytics import ws_tokens

    n = docs.count()
    terms = ["spark", "merge", "batch"]
    index = build_index(docs.select("doc_id", "text"), tokenizer=ws_tokens)
    qt = spark.createDataFrame(
        [(0, t) for t in terms], "query_id int, term string"
    )
    pr = g.pagerank(docs, edges, n, iters=5)
    fused = g.fused_bm25_pagerank(index, qt, pr, n, k=1000, terms=terms)
    bare = score_bm25(index, qt, k=1000, terms=terms)
    f = {r["doc_id"]: r["score"] for r in fused.collect()}
    b = {r["doc_id"]: r["score"] for r in bare.collect()}
    prm = {r["doc_id"]: r["pr"] for r in pr.collect()}
    assert set(f) == set(b)  # fusion never drops or invents a match
    for d in f:
        assert f[d] == pytest.approx(b[d] * (1.0 + n * prm[d]), rel=1e-9)


def test_hits_rejects_zero_iters(spark, docs, edges):
    # iters=0 would leave auth undefined — must fail loudly, not crash
    # deep inside the final join
    with pytest.raises(ValueError, match="iters"):
        g.hits(docs, edges, iters=0)


def test_personalized_pagerank_is_a_distribution(spark, docs, edges):
    n = docs.count()
    seeds = docs.select("doc_id").filter(F.col("doc_id") % 17 == 0).select(
        "doc_id", F.lit(1.0).alias("w")
    )
    ppr = g.personalized_pagerank(docs, edges, seeds, iters=5)
    total = ppr.agg(F.sum("pr")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9
    assert ppr.count() == n


def test_personalized_pagerank_confines_mass_to_seed_component(spark):
    # two disjoint 3-cycles; seeds only in the first → the second
    # community receives no teleport and no flow, its mass decays to 0
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    cyc = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)]
    edges = spark.createDataFrame(cyc, "src long, dst long")
    seeds = spark.createDataFrame([(1, 1.0)], "doc_id long, w double")
    ppr = {r["doc_id"]: r["pr"] for r in
           g.personalized_pagerank(nodes, edges, seeds, iters=20).collect()}
    assert ppr[4] < 1e-6 and ppr[5] < 1e-6 and ppr[6] < 1e-6
    assert min(ppr[1], ppr[2], ppr[3]) > 0.2
    # seed pulls ahead of its own cycle-mates via the teleport term
    assert ppr[1] > ppr[2] and ppr[1] > ppr[3]


def test_personalized_pagerank_uniform_seeds_equals_pagerank(spark, docs, edges):
    n = docs.count()
    uniform = docs.select("doc_id", F.lit(1.0).alias("w"))
    a = {r["doc_id"]: r["pr"] for r in
         g.personalized_pagerank(docs, edges, uniform, iters=3).collect()}
    b = {r["doc_id"]: r["pr"] for r in
         g.pagerank(docs, edges, n, iters=3).collect()}
    assert set(a) == set(b)
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)
