from search_engine_spark.sources.corpus import synth_pages  # noqa: F401
from search_engine_spark.sources.fetch import (  # noqa: F401
    DeterministicTransport,
    ScriptedTransport,
    UrllibTransport,
    fetch_pages,
    read_seeds,
)
