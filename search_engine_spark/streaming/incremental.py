"""Incremental re-index via Structured Streaming (SURVEY §2.8 stretch).

The reference indexer is batch-with-polling: an unbounded loop over
"crawled-not-indexed" 500-page batches with a 10 s sleep when the queue
is empty (tf-idf-indexer/src/lib.rs:389-413), merging each batch into
the global index (A7, lib.rs:467-529). The Spark-native equivalent is a
file/Iceberg stream:

    new page files land under <input_path>
      → readStream (explicit PAGES schema, no inference)
      → foreachBatch: prepare_docs → raw postings for JUST this batch
      → idempotent write to state/postings_raw/batch=<epoch_id>
      → finalize: global df/idf/N/avgdl recompute over all batches

- `Trigger.AvailableNow` drains everything currently available and
  stops — the reference's "poll until queue empty" loop, minus the
  sleep. A long-running deployment would use a processing-time trigger
  with the identical foreachBatch body.
- Exactly-once: the stream checkpoint (offsets/commits under
  state/_stream_ckpt) guarantees each input file is in exactly one
  epoch; the per-epoch OVERWRITE of `batch=<epoch_id>` makes epoch
  replay after a mid-write crash idempotent.
- The merge-with-existing-index dance from the reference collapses to a
  stateless recompute (`index_from_raw_postings`) over the union of all
  batch postings — identical math to the one-shot batch build, which is
  what the reference's own batch-end recompute converges to (SURVEY
  §5.2). The recompute touches only the compact (doc_id, term, tf)
  relation, never re-tokenizes old batches, so incremental cost is
  O(new docs) tokenization + one global agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import (
    B,
    K1,
    InvertedIndex,
    index_from_raw_postings,
    prepare_docs,
    raw_postings_from_docs,
)
from search_engine_spark.schemas import PAGES


def incremental_index_update(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    tokenizer=None,
    recompute_text: bool = False,
    max_files_per_trigger: int | None = None,
) -> InvertedIndex:
    """Drain all new page files under input_path into the postings state,
    then return the finalized index. Call again after more files land —
    already-processed files are skipped via the stream checkpoint."""
    reader = spark.readStream.schema(PAGES)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        docs = prepare_docs(batch, id_method="hash", recompute_text=recompute_text)
        raw = raw_postings_from_docs(docs, tokenizer)
        (
            raw.select("doc_id", "term", "tf")
            .write.mode("overwrite")
            .parquet(f"{state_path}/postings_raw/batch={epoch_id}")
        )

    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", f"{state_path}/_stream_ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return read_state_index(spark, state_path)


def read_state_index(
    spark: SparkSession, state_path: str, k1: float = K1, b: float = B
) -> InvertedIndex:
    """Finalize the accumulated batch postings into a queryable index.

    Re-delivered docs (the same url appearing in a later batch — the
    reference's re-crawl case) keep only the LATEST batch's postings,
    mirroring its term upsert ON CONFLICT DO UPDATE (lib.rs:231-258):
    per doc_id the max batch epoch wins.
    """
    # Drop any cached plan over this path from a previous drain in the
    # same session: CacheManager matches on the analyzed plan, which is
    # path-based, so without this the old file list (and old persisted
    # rows) would silently shadow newly-landed epoch dirs.
    spark.catalog.refreshByPath(f"{state_path}/postings_raw")
    raw = spark.read.option("basePath", f"{state_path}/postings_raw").parquet(
        f"{state_path}/postings_raw"
    )
    latest = raw.groupBy("doc_id").agg(F.max("batch").alias("batch"))
    deduped = raw.join(latest, ["doc_id", "batch"]).select("doc_id", "term", "tf")
    return index_from_raw_postings(deduped, k1=k1, b=b)


def compact_state(spark: SparkSession, state_path: str) -> int:
    """Rewrite the accumulated per-epoch postings dirs into ONE batch
    dir holding the latest-wins relation — the small-files compaction
    every long-running ingest loop needs: after K drains the state is
    K directories of tiny files, and both the finalize scan and the
    file-listing RPC cost grow with K, not with data. Returns the
    number of epoch dirs compacted away.

    Semantics-preserving by construction: the compacted relation IS
    `read_state_index`'s latest-wins dedup, written under the HIGHEST
    existing epoch id — a doc re-delivered by any LATER drain still
    outranks it, and the stream checkpoint (untouched) keeps assigning
    fresh epochs, so drains continue seamlessly after compaction.

    The swap is write-fully-then-rename, driver-side (local
    filesystem); on a cluster this operation is the table format's
    transactional compaction (Iceberg rewrite_data_files / Delta
    OPTIMIZE) with the identical latest-wins projection.
    """
    import os
    import shutil

    root = f"{state_path}/postings_raw"
    spark.catalog.refreshByPath(root)
    batches = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("batch=")
    )
    if len(batches) <= 1:
        return 0
    raw = spark.read.option("basePath", root).parquet(root)
    latest = raw.groupBy("doc_id").agg(F.max("batch").alias("batch"))
    deduped = (
        raw.join(latest, ["doc_id", "batch"]).select("doc_id", "term", "tf")
    )
    tmp = f"{state_path}/postings_raw.compact"
    deduped.write.mode("overwrite").parquet(f"{tmp}/batch={batches[-1]}")
    old = f"{state_path}/postings_raw.old"
    os.rename(root, old)
    os.rename(tmp, root)
    shutil.rmtree(old)
    spark.catalog.refreshByPath(root)
    return len(batches) - 1
