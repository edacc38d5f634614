"""Count-Min sketch (operators/sketch.py): upper-bound guarantee, grid
bounds, hash-family plumbing. Oracle value parity runs in
test_entry_oracle.py.
"""

from __future__ import annotations

from collections import Counter

from search_engine_spark.operators.sketch import cms_build, cms_estimate

DOC_SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_estimates_upper_bound_true_counts(spark):
    texts = ["a a a b c", "b c c d", "a d d d e"]
    true = Counter(" ".join(texts).split())
    docs = _docs(spark, list(enumerate(texts)))
    cms = cms_build(docs, depth=4, width=64).cache()
    est = {
        r["term"]: r["est"]
        for r in cms_estimate(cms, list(true), depth=4, width=64).collect()
    }
    for t, c in true.items():
        assert est[t] >= c, (t, est[t], c)
    # tiny corpus, 64 buckets: collisions are unlikely, estimates exact
    assert est == dict(true)


def test_absent_term_estimates_zero_on_sparse_grid(spark):
    docs = _docs(spark, [(1, "x y z")])
    cms = cms_build(docs, depth=4, width=256)
    est = cms_estimate(cms, ["never-seen"], depth=4, width=256).first()
    assert est["est"] == 0


def test_grid_is_sketch_sized(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    depth, width = 4, 32
    grid = cms_build(docs, depth=depth, width=width).collect()
    assert len(grid) <= depth * width
    assert {r["j"] for r in grid} == set(range(depth))
    assert all(0 <= r["bucket"] < width for r in grid)
    # total mass per row j equals the token count
    per_j = Counter()
    for r in grid:
        per_j[r["j"]] += r["cnt"]
    assert len(set(per_j.values())) == 1


def test_xxhash64_family_builds_same_shape(spark):
    docs = _docs(spark, [(1, "a b c a")])
    grid = cms_build(docs, depth=2, width=16, family="xxhash64").collect()
    assert sum(r["cnt"] for r in grid) == 8  # 4 tokens x depth 2


def test_bloom_never_false_negative(spark):
    from search_engine_spark.operators.sketch import bloom_build, bloom_probe

    vals = [(f"url-{i}",) for i in range(500)]
    df = spark.createDataFrame(vals, "u string")
    bloom = bloom_build(df, "u", m=1 << 14, k=4).cache()
    probed = bloom_probe(bloom, df, "u", m=1 << 14, k=4)
    assert probed.filter("NOT maybe_present").count() == 0


def test_bloom_definite_miss_and_fp_rate(spark):
    from search_engine_spark.operators.sketch import bloom_build, bloom_probe

    member = spark.createDataFrame(
        [(f"url-{i}",) for i in range(1024)], "u string"
    )
    other = spark.createDataFrame(
        [(f"other-{i}",) for i in range(1024)], "u string"
    )
    bloom = bloom_build(member, "u", m=1 << 14, k=4).cache()
    fp = bloom_probe(bloom, other, "u", m=1 << 14, k=4).filter(
        "maybe_present"
    ).count()
    # m/n = 16, k = 4 -> theoretical fp ~2.4%; allow generous slack
    assert fp / 1024 < 0.10


def test_hll_estimate_tracks_true_cardinality(spark):
    from search_engine_spark.operators.sketch import hll_estimate

    df = spark.createDataFrame(
        [(f"item-{i % 3000}",) for i in range(9000)], "v string"
    )
    est = hll_estimate(df, "v", b=8).first()["estimate"]
    # m=256 -> standard error ~6.5%; duplicates must not inflate it
    assert abs(est - 3000) / 3000 < 0.20


def test_hll_small_range_uses_linear_counting(spark):
    from search_engine_spark.operators.sketch import hll_estimate

    df = spark.createDataFrame([(f"x{i}",) for i in range(20)], "v string")
    r = hll_estimate(df, "v", b=8).first()
    assert r["n_registers"] <= 20
    assert abs(r["estimate"] - 20) < 3  # linear counting is near-exact here


def test_sketch_merge_identities(spark):
    from search_engine_spark.operators.sketch import (
        cms_build,
        cms_merge,
        hll_merge,
        hll_registers,
    )

    a = _docs(spark, [(1, "x y z z"), (2, "p q")])
    b = _docs(spark, [(3, "x q r r r")])
    both = _docs(
        spark, [(1, "x y z z"), (2, "p q"), (3, "x q r r r")]
    )
    merged = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_merge(
            cms_build(a, depth=3, width=32), cms_build(b, depth=3, width=32)
        ).collect()
    }
    direct = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_build(both, depth=3, width=32).collect()
    }
    assert merged == direct
    hm = {
        r["bucket"]: r["rho"]
        for r in hll_merge(
            hll_registers(a.selectExpr("explode(split(text, ' ')) AS v"), "v"),
            hll_registers(b.selectExpr("explode(split(text, ' ')) AS v"), "v"),
        ).collect()
    }
    hd = {
        r["bucket"]: r["rho"]
        for r in hll_registers(
            both.selectExpr("explode(split(text, ' ')) AS v"), "v"
        ).collect()
    }
    assert hm == hd


def test_cms_stream_incremental_two_drains(spark, tmp_path):
    from search_engine_spark.operators.sketch import cms_build
    from search_engine_spark.streaming.sketches import cms_stream, read_cms_state

    base = str(tmp_path)
    a = _docs(spark, [(1, "x y z z"), (2, "p q")])
    b = _docs(spark, [(3, "x q r r r")])
    a.write.parquet(f"{base}/in/drop0")
    g1 = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_stream(
            spark, f"{base}/in/drop*", f"{base}/state", depth=3, width=32
        ).collect()
    }
    want1 = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_build(a, depth=3, width=32).collect()
    }
    assert g1 == want1
    # second drop: only the delta is processed, state folds to a+b
    b.write.parquet(f"{base}/in/drop1")
    g2 = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_stream(
            spark, f"{base}/in/drop*", f"{base}/state", depth=3, width=32
        ).collect()
    }
    both = _docs(spark, [(1, "x y z z"), (2, "p q"), (3, "x q r r r")])
    want2 = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_build(both, depth=3, width=32).collect()
    }
    assert g2 == want2
    # read-only state access agrees without a drain
    g3 = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in read_cms_state(spark, f"{base}/state").collect()
    }
    assert g3 == want2


def test_cms_state_empty_before_first_drain(spark, tmp_path):
    from search_engine_spark.streaming.sketches import read_cms_state

    out = read_cms_state(spark, str(tmp_path / "nope"))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["j", "bucket", "cnt"]


def test_hll_group_estimates_match_per_group_singles(spark):
    from search_engine_spark.operators.sketch import (
        hll_estimate,
        hll_group_estimate,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", f"x{i % 40}") for i in range(200)]
        + [("b", f"y{i % 7}") for i in range(100)],
        "g string, v string",
    )
    grouped = {
        r["g"]: (r["n_registers"], r["estimate"])
        for r in hll_group_estimate(df, "g", "v", b=8).collect()
    }
    for g in ("a", "b"):
        single = hll_estimate(df.filter(F.col("g") == g), "v", b=8).first()
        assert grouped[g] == (single["n_registers"], single["estimate"]), g
    # linear-counting regime here: estimates near-exact
    assert abs(grouped["a"][1] - 40) < 5
    assert abs(grouped["b"][1] - 7) < 2


def test_histogram_quantiles_interpolate_correctly(spark):
    from search_engine_spark.operators.sketch import histogram_quantiles

    # 100 values 0..99, width 10: exact quantile of the uniform grid
    df = spark.createDataFrame([(i,) for i in range(100)], "v long")
    out = {
        r["q"]: r for r in histogram_quantiles(
            df, "v", [0.5, 0.95], bucket_width=10
        ).collect()
    }
    # q=0.5: cum reaches 50 in bucket 4 (values 40..49, cum_before 40):
    # est = 40 + 10*(50-40)/10 = 50
    assert out[0.5]["estimate"] == 50.0
    assert (out[0.5]["bucket_lo"], out[0.5]["bucket_hi"]) == (40, 50)
    # q=0.95: 95 falls in bucket 9 (cum_before 90): 90 + 10*5/10 = 95
    assert out[0.95]["estimate"] == 95.0


def test_histogram_quantiles_monotone_and_bounded(spark):
    from search_engine_spark.operators.sketch import histogram_quantiles

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = histogram_quantiles(
        docs, "n_chars", [0.1, 0.5, 0.9, 0.99], bucket_width=64
    ).collect()
    ests = [r["estimate"] for r in rows]
    assert ests == sorted(ests)
    for r in rows:
        assert r["bucket_lo"] <= r["estimate"] <= r["bucket_hi"]


def test_hll_stream_incremental_two_drains(spark, tmp_path):
    from search_engine_spark.operators.sketch import hll_registers
    from search_engine_spark.streaming.sketches import hll_stream

    base = str(tmp_path)
    a = _docs(spark, [(1, "x y z z"), (2, "p q")])
    b = _docs(spark, [(3, "x q r r r")])
    a.write.parquet(f"{base}/in/drop0")
    hll_stream(spark, f"{base}/in/drop*", f"{base}/state", b=4)
    b.write.parquet(f"{base}/in/drop1")
    g = {
        r["bucket"]: r["rho"]
        for r in hll_stream(
            spark, f"{base}/in/drop*", f"{base}/state", b=4
        ).collect()
    }
    both = _docs(
        spark, [(1, "x y z z"), (2, "p q"), (3, "x q r r r")]
    )
    want = {
        r["bucket"]: r["rho"]
        for r in hll_registers(
            both.selectExpr("explode(split(text, ' ')) AS term"), "term", b=4
        ).collect()
    }
    assert g == want


def test_bloom_stream_union_equals_batch_build(spark, tmp_path):
    from search_engine_spark.operators.sketch import bloom_build
    from search_engine_spark.streaming.sketches import bloom_stream

    base = str(tmp_path)
    a = _docs(spark, [(1, "x y z"), (2, "p q")])
    b = _docs(spark, [(3, "x q r")])
    a.write.parquet(f"{base}/in/drop0")
    bloom_stream(spark, f"{base}/in/drop*", f"{base}/state", m=1 << 10, k=3)
    b.write.parquet(f"{base}/in/drop1")
    got = {
        r["pos"]
        for r in bloom_stream(
            spark, f"{base}/in/drop*", f"{base}/state", m=1 << 10, k=3
        ).collect()
    }
    both_vocab = spark.createDataFrame(
        [(t,) for t in ["x", "y", "z", "p", "q", "r"]], "term string"
    )
    want = {
        r["pos"]
        for r in bloom_build(both_vocab, "term", m=1 << 10, k=3).collect()
    }
    assert got == want


def test_histogram_quantile_zero_returns_first_bucket_edge(spark):
    from search_engine_spark.operators.sketch import histogram_quantiles

    df = spark.createDataFrame([(i,) for i in range(20, 100)], "v long")
    out = {
        r["q"]: r
        for r in histogram_quantiles(
            df, "v", [0.0, 0.5], bucket_width=10
        ).collect()
    }
    # q=0.0 used to vanish (cum_before < 0 never true); it must pin to
    # the FIRST bucket's lower edge
    assert 0.0 in out
    assert out[0.0]["estimate"] == out[0.0]["bucket_lo"] == 20
    assert 0.5 in out


def test_hll_rejects_register_widths_below_eight(spark):
    import pytest

    from search_engine_spark.operators.sketch import (
        hll_estimate,
        hll_group_estimate,
        hll_registers,
    )

    df = spark.createDataFrame([("a",), ("b",)], "v string")
    # b <= 7: rho can reach (60-b)+1 > 53, making shiftleft(1, 53-rho)
    # negative -> JVM masks mod 64 into Long.MIN_VALUE. Registers
    # themselves are fine at any b (streaming state uses tiny grids);
    # only the ESTIMATORS must reject.
    for b in (4, 7):
        with pytest.raises(ValueError, match="must be in"):
            hll_estimate(df, "v", b=b)
        with pytest.raises(ValueError, match="must be in"):
            hll_group_estimate(df, "v", "v", b=b)
    with pytest.raises(ValueError, match="must be in"):
        hll_estimate(df, "v", b=17)
    assert hll_registers(df, "v", b=4).count() >= 1
