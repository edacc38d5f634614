"""Corpus-trained n-gram language model quality scoring (engine
addition; no reference analog — the reference has no curation surface).

The CCNet recipe (Wenzek et al. 2020) scores web documents by the
perplexity of a language model trained on a trusted corpus and keeps
the low-perplexity head — the single most load-bearing quality gate in
open web-text pipelines (CCNet, RedPajama, FineWeb all run a variant).
Here the model is an add-k-smoothed bigram LM trained ON the corpus
itself with plain DataFrame aggregates, so the whole gate is
expressible as two groupBys + one join at any scale:

- training: C(w1,w2) and C(w1) token counts — two hash aggregates with
  map-side combine, shuffled on the n-gram key (uniformly distributed,
  no skew dance needed beyond AQE);
- scoring: each doc's bigram stream joins the model on (w1,w2) — one
  shuffle of (doc_id, w1, w2) ids; unseen bigrams get the smoothed
  floor k/(C(w1)+k·V) via a LEFT join + coalesce, w1 unseen at all
  falls back to C(w1)=0 (pure smoothing mass);
- the gate: keep docs whose mean token log-probability is at or above
  the corpus median — computed as a 1-row aggregate broadcast back
  into a filter, never a driver collect.

Scores are length-normalized (mean ln p per bigram token), so the gate
does not simply prefer short documents. Scores are ≤ 0; higher = more
fluent under the corpus model. All math is Catalyst expressions
(ln/avg/round) — no Python on any path.

Adjacency is over the POST-FILTER token stream (empty tokens dropped),
the same stream TF counts — so the model and the positional index
agree on what "adjacent" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.operators.text_analytics import ws_tokens

__all__ = ["bigram_counts", "doc_bigram_logprob", "perplexity_gate"]


def _positioned_tokens(documents: DataFrame, tokenizer) -> DataFrame:
    tok = tokenizer or ws_tokens
    return documents.select(
        "doc_id", F.posexplode(tok(F.col("text"))).alias("pos", "term")
    )


def _doc_bigrams(documents: DataFrame, tokenizer) -> DataFrame:
    """(doc_id, w1, w2) — consecutive token pairs per doc. One shuffle
    on doc_id (the window); a doc's tokens are processed together,
    which is also the memory bound (max doc length, not corpus size)."""
    toks = _positioned_tokens(documents, tokenizer)
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        toks.withColumn("w2", F.lead("term").over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.col("term").alias("w1"), "w2")
    )


def bigram_counts(
    documents: DataFrame, tokenizer=None
) -> tuple[DataFrame, DataFrame, int]:
    """((w1, w2, n) bigram counts, (w1, n1) unigram-context counts,
    vocabulary size V). The model's sufficient statistics — two hash
    aggregates; V is a 1-scalar driver barrier."""
    bg = _doc_bigrams(documents, tokenizer)
    pair_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    ctx_counts = pair_counts.groupBy("w1").agg(F.sum("n").alias("n1"))
    vocab = (
        _positioned_tokens(documents, tokenizer)
        .agg(F.countDistinct("term").alias("v"))
        .first()["v"]
    )
    return pair_counts, ctx_counts, int(vocab)


def doc_bigram_logprob(
    documents: DataFrame,
    k_smooth: float = 0.5,
    tokenizer=None,
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob): mean ln p(w2|w1) over the doc's
    bigram stream under the corpus-trained add-k model

        p(w2|w1) = (C(w1,w2) + k) / (C(w1) + k·V).

    Docs with < 2 tokens have no bigrams and are absent from the output
    (callers decide their fate — the gate keeps them out like CCNet's
    too-short bucket). 6dp rounding for cross-engine comparison.
    """
    pair_counts, ctx_counts, vocab = bigram_counts(documents, tokenizer)
    bg = _doc_bigrams(documents, tokenizer)
    scored = (
        bg.join(pair_counts, ["w1", "w2"], "left")
        .join(ctx_counts, "w1", "left")
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("n"), F.lit(0)).cast("double") + F.lit(k_smooth))
                / (
                    F.coalesce(F.col("n1"), F.lit(0)).cast("double")
                    + F.lit(k_smooth * vocab)
                )
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


def perplexity_gate(
    documents: DataFrame,
    k_smooth: float = 0.5,
    tokenizer=None,
) -> DataFrame:
    """CCNet-style head cut: keep docs whose mean bigram
    log-probability is ≥ the corpus median (lower perplexity than the
    typical document). Returns the kept docs' (doc_id, lang, source,
    avg_logprob).

    The median is an exact percentile over the 6dp-ROUNDED scores — a
    1-row aggregate cross-joined back (broadcast by size), so the gate
    is one job with no driver collect and the threshold is a pure
    function of the corpus (reproducible across engines; interpolation
    over identical rounded inputs yields identical doubles).
    """
    scores = doc_bigram_logprob(documents, k_smooth, tokenizer)
    med = scores.agg(
        F.percentile("avg_logprob", F.lit(0.5)).alias("med")
    )
    return (
        documents.select("doc_id", "lang", "source")
        .join(scores.select("doc_id", "avg_logprob"), "doc_id")
        .join(med)
        .filter(F.col("avg_logprob") >= F.col("med"))
        .select("doc_id", "lang", "source", "avg_logprob")
    )
