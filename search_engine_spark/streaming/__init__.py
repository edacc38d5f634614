from search_engine_spark.streaming.incremental import (  # noqa: F401
    incremental_index_update,
    read_state_index,
)
from search_engine_spark.streaming.sessions import streaming_sessions  # noqa: F401
from search_engine_spark.streaming.windows import (  # noqa: F401
    streaming_windowed_counts,
)
