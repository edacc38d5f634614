"""Zip-safe access to the package's vendored data files.

On a real cluster the package ships as `spark-submit --py-files
search_engine_spark.zip` (README/north rule); Spark adds the zip to
sys.path WITHOUT extracting it, so `Path(__file__)/..` file access
raises FileNotFoundError on every executor and on the driver.
`importlib.resources` resolves through zipimport and the filesystem
alike, so the stop-word lists and the Public Suffix List load
identically under pytest, bench.py, and --py-files deployment
(covered end-to-end by tests/test_submit.py).
"""

from __future__ import annotations

from functools import lru_cache
from importlib import resources


@lru_cache(maxsize=8)
def read_data(fname: str) -> str:
    """Return the text of search_engine_spark/data/<fname>."""
    return (
        resources.files("search_engine_spark")
        .joinpath("data")
        .joinpath(fname)
        .read_text(encoding="utf-8")
    )
