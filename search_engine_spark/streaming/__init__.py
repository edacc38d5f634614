from search_engine_spark.streaming.incremental import (  # noqa: F401
    incremental_index_update,
    read_state_index,
)
