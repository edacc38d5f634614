"""BPE merge training over the corpus word table (Sennrich, Haddow,
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units" — public knowledge; no reference analog: dastarruer/
search-engine has no tokenizer-training surface).

Classical formulation: merges are learned over the UNIQUE-WORD table
weighted by corpus frequency — at web scale the word table is ~10^8
rows while the corpus is 10^12 tokens, so training cost is decoupled
from corpus size (the word count aggregation is the only corpus-sized
job). Each merge round is:

  1. adjacent-pair counts: one lead() window + one weighted hash agg
     over the symbol rows (overlapping occurrences count, as in the
     original get_stats),
  2. argmax pair (count DESC, then lexicographic) — a 1-row driver
     collect, the same k-scalar-barriers pattern as the Lloyd loops,
  3. apply: LEFT-TO-RIGHT non-overlapping replacement. Overlap is only
     possible for a==b runs ("aaa" + merge (a,a) → "aa"+"a"); the
     gaps-and-islands parity trick (merge the 1st, 3rd, … match of
     each consecutive run) reproduces the greedy scan exactly, in one
     window pass instead of a sequential loop.

All windows partition by the word, so each round re-uses ONE hash
partitioning of the symbol rows; rounds localCheckpoint (the window
chain would otherwise deepen the plan per round). The DuckDB oracle
unrolls the same rounds with MATERIALIZED CTEs; rounds where no pair
remains are symmetric no-ops on both sides (the merge table just gets
no row for that rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.operators.text_analytics import ws_tokens

__all__ = ["word_symbols", "bpe_train", "bpe_segment", "bpe_token_counts"]


def word_symbols(documents: DataFrame, tokenizer=ws_tokens) -> DataFrame:
    """(term, cnt, pos, sym): each unique word split to single-char
    symbols (pos 1-based), weighted by its corpus occurrence count."""
    words = (
        documents.select(F.explode(tokenizer(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # (?!^) also matches at end-of-string, so split leaves a trailing
    # "" element — drop empties (order-preserving) before numbering
    chars = F.filter(
        F.split(F.col("term"), r"(?!^)"), lambda x: x != F.lit("")
    )
    return words.select(
        "term", "cnt", F.posexplode(chars).alias("p0", "sym")
    ).select("term", "cnt", (F.col("p0") + 1).alias("pos"), "sym")


def _apply_merge(seq: DataFrame, a: str, b: str) -> DataFrame:
    """One greedy left-to-right replacement of adjacent (a, b) → a+b."""
    w = Window.partitionBy("term").orderBy("pos")
    m = seq.withColumn("nxt", F.lead("sym").over(w))
    matches = (
        m.filter((F.col("sym") == a) & (F.col("nxt") == b))
        .select("term", "pos")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("grp", F.col("pos") - F.col("rn"))
    )
    wg = Window.partitionBy("term", "grp").orderBy("pos")
    starts = (
        matches.withColumn("k", F.row_number().over(wg))
        .filter(F.col("k") % 2 == 1)
        .select("term", "pos", F.lit(1).alias("is_m"))
    )
    s = (
        seq.join(starts, ["term", "pos"], "left")
        .withColumn("prev_m", F.lag("is_m").over(w))
        .filter(F.col("prev_m").isNull())
        .select(
            "term",
            "cnt",
            F.row_number().over(w).alias("pos"),
            F.when(F.col("is_m") == 1, F.lit(a + b)).otherwise(
                F.col("sym")
            ).alias("sym"),
        )
    )
    return s


def bpe_train(
    documents: DataFrame, merges: int = 8, tokenizer=ws_tokens
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn `merges` BPE merges; returns (merge_table, final_symbols).

    merge_table rows are (lhs, rhs, pair_count) in rank order; the
    final symbol rows are the corpus word table segmented by every
    learned merge (the input to bpe_segment / vocabulary export).
    """
    seq = word_symbols(documents, tokenizer).localCheckpoint(eager=True)
    table: list[tuple[str, str, int]] = []
    w = Window.partitionBy("term").orderBy("pos")
    for _ in range(merges):
        top = (
            seq.withColumn("nxt", F.lead("sym").over(w))
            .filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("sym").asc(), F.col("nxt").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0]["sym"], top[0]["nxt"], int(top[0]["c"])
        table.append((a, b, c))
        seq = _apply_merge(seq, a, b).localCheckpoint(eager=True)
    return table, seq


def bpe_segment(final_symbols: DataFrame) -> DataFrame:
    """(term, cnt, segmented): each word's learned subword split,
    space-joined in position order — the tokenizer's vocabulary view."""
    return final_symbols.groupBy("term", "cnt").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sym"))),
                lambda x: x["sym"],
            ),
        ).alias("segmented")
    )


def bpe_token_counts(
    documents: DataFrame, final_symbols: DataFrame, tokenizer=ws_tokens
) -> DataFrame:
    """(doc_id, n_bpe_tokens): corpus token counts under the LEARNED
    subword vocabulary — the number that actually prices a training run
    (tokens-per-doc in model units, not whitespace words).

    Applying BPE to a corpus is a JOIN, not a re-segmentation: merges
    were learned over the unique-word table, so each word's piece count
    is already decided there; the corpus pass is tokens ⋈ (word →
    n_pieces) + one sum — the same decoupling that made training
    corpus-size-independent makes application an equi-join on the word
    table. No forced broadcast hint: the pieces side is the corpus
    VOCABULARY (~10^8 rows / multi-GB at web scale), so the join is
    left to AQE, which broadcasts it only when its measured size is
    actually under the threshold and falls back to a shuffled hash
    join otherwise."""
    pieces = final_symbols.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_pieces")
    )
    toks = documents.select(
        "doc_id", F.explode(tokenizer(F.col("text"))).alias("term")
    )
    return (
        toks.join(pieces, "term")
        .groupBy("doc_id")
        .agg(F.sum("n_pieces").cast("long").alias("n_bpe_tokens"))
    )
