"""search_engine_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch, Spark-first re-expression of the query/data-processing
capabilities of the reference system ``dastarruer/search-engine``
(single-node Rust crawler + TF-IDF indexer + Postgres-backed Flask query
app).  Nothing here is a port: the reference tells us WHAT to compute
(see SURVEY.md with file:line citations); the HOW is idiomatic
DataFrame/Catalyst/Arrow code designed for a 1000-executor cluster over
~100 TB of Common-Crawl-style web pages.

Layout
------
- ``functions/``  text extraction + tokenization (vectorized pandas UDFs,
  shared byte-for-byte with the single-node oracle), text analytics.
- ``sources/``    deterministic synthetic page corpus + table catalog IO.
- ``operators/``  index build (postings/df/idf/blocks/compression, skew
  salting), query scoring (TF-IDF-compat + BM25, block-max pruned top-k),
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
  search over embeddings.
- ``streaming/``  incremental (AvailableNow) index maintenance.
- ``checkpoint.py`` per-partition lineage + metrics + resume.
"""

__version__ = "0.1.0"
