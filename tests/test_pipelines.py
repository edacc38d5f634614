"""Composed corpus-cleaning pipeline (operators/pipelines.py)."""

from __future__ import annotations

from search_engine_spark.operators.pipelines import clean_corpus


def test_clean_corpus_stages(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en"),
        (2, "alpha beta gamma delta epsilon zeta", "en"),    # exact dup of 1
        (3, "alpha beta gamma delta epsilon zetaa", "en"),   # near dup of 1
        (4, "completely different text with many proper words", "en"),
        (5, "zu kurz", "de"),                                # wrong lang
        (6, "too few", "en"),                                # < 5 tokens
        (7, "a b c d e f g h", "en"),                        # avg token len 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept, audit = clean_corpus(docs, min_tokens=5, min_avg_token_len=2.0)
    kept_ids = {r["doc_id"] for r in kept.collect()}

    assert audit.n_input == 7
    assert audit.n_after_lang == 6          # drop 5 (de)
    assert audit.n_after_exact == 5         # drop 2 (exact dup)
    assert audit.n_after_near <= 5          # near-dup 3 may collapse into 1
    assert 1 in kept_ids and 4 in kept_ids
    assert 2 not in kept_ids and 5 not in kept_ids
    assert 6 not in kept_ids and 7 not in kept_ids
    assert audit.n_after_quality == len(kept_ids)


def test_langid_ngram_separates_languages(spark):
    from search_engine_spark.operators.text_analytics import langid_ngram

    rows = [
        (1, "the cat and the dog are in the house with all of them"),
        (2, "der hund und die katze sind in dem haus mit den kindern"),
        (3, "le chat et le chien sont dans la maison avec les enfants"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in langid_ngram(docs).collect()}
    assert got == {1: "en", 2: "de", 3: "fr"}


def test_rolling_fingerprints_shared_substring(spark):
    from search_engine_spark.operators.text_analytics import rolling_fingerprints

    shared = "identical shared passage of text here"
    rows = [
        (1, "prefix one " + shared + " suffix alpha"),
        (2, "other start " + shared + " different end"),
        (3, "nothing in common with the others at all whatsoever"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = rolling_fingerprints(docs, k=7, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # winnowing guarantee: a shared substring of length >= k+window-1
    # (10) forces at least one common fingerprint
    assert by_doc[1] & by_doc[2]
    # determinism
    again = {}
    for r in rolling_fingerprints(docs, k=7, window=4).collect():
        again.setdefault(r["doc_id"], set()).add(r["fp"])
    assert again == by_doc


class TestResampleCorpus:
    @staticmethod
    def _skewed(spark):
        # 80 docs from the head source, 20 from the tail
        rows = [(i, "head" if i < 80 else "tail", f"w{i}") for i in range(100)]
        return spark.createDataFrame(rows, "doc_id long, source string, text string")

    def test_temperature_one_is_identity(self, spark):
        from search_engine_spark.operators.pipelines import resample_corpus

        docs = self._skewed(spark)
        assert resample_corpus(docs, temperature=1.0).count() == 100

    def test_low_temperature_flattens_the_head(self, spark):
        from search_engine_spark.operators.pipelines import resample_corpus
        import pyspark.sql.functions as F

        docs = self._skewed(spark)
        out = resample_corpus(docs, temperature=0.0)  # target uniform
        per = {r["source"]: r["n"] for r in
               out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        # the tail (binding constraint) keeps everything; the head is
        # downsampled toward the 20-doc tail (hash noise allowed)
        assert per["tail"] == 20
        assert per.get("head", 0) < 40

    def test_membership_stable_under_repartition(self, spark):
        from search_engine_spark.operators.pipelines import resample_corpus

        docs = self._skewed(spark)
        a = {r["doc_id"] for r in resample_corpus(docs, temperature=0.5).collect()}
        b = {r["doc_id"] for r in
             resample_corpus(docs.repartition(7), temperature=0.5).collect()}
        assert a == b

    def test_families_are_both_deterministic(self, spark):
        from search_engine_spark.operators.pipelines import resample_corpus

        docs = self._skewed(spark)
        for fam in ("xxhash64", "portable"):
            a = {r["doc_id"] for r in
                 resample_corpus(docs, temperature=0.3, family=fam).collect()}
            b = {r["doc_id"] for r in
                 resample_corpus(docs, temperature=0.3, family=fam).collect()}
            assert a == b

    def test_negative_temperature_rejected(self, spark):
        from search_engine_spark.operators.pipelines import resample_corpus

        import pytest as _pytest

        with _pytest.raises(ValueError):
            resample_corpus(self._skewed(spark), temperature=-0.1)


def test_split_corpus_disjoint_exhaustive_and_stable(spark):
    from pyspark.sql import functions as F

    from search_engine_spark.operators.pipelines import split_corpus

    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    out = split_corpus(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7
    )
    rows = out.collect()
    assert len(rows) == 2000  # fractions sum to 1.0 → exhaustive
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "val", "test"}
    assert sum(len(v) for v in by.values()) == 2000  # disjoint
    assert 0.75 < len(by["train"]) / 2000 < 0.85
    # membership is a pure row function: repartitioning cannot move docs
    again = {
        (r["doc_id"], r["split"])
        for r in split_corpus(
            docs.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1},
            seed=7,
        ).collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in rows}


def test_split_corpus_holdout_carving_and_validation(spark):
    import pytest
    from pyspark.sql import functions as F

    from search_engine_spark.operators.pipelines import split_corpus

    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    out = split_corpus(docs, {"train": 0.5}, seed=7)
    n = out.count()
    assert 400 < n < 600  # the other half is dropped (holdout)
    with pytest.raises(ValueError):
        split_corpus(docs, {"a": 0.9, "b": 0.2}, seed=7)
