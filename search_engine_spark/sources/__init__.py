from search_engine_spark.sources.corpus import synth_pages  # noqa: F401
