from search_engine_spark.functions.textproc import (  # noqa: F401
    extract_text,
    extract_text_udf,
    extract_title,
    normalize_term,
    tokenize,
    tokenize_udf,
)
