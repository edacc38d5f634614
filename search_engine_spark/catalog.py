"""Thin table-IO layer: Iceberg when available, Parquet otherwise.

SURVEY §7.1(c): the engine's storage contract is Iceberg-shaped —
partitioned data + lineage/metrics side tables + atomic replacement —
but this sandbox ships no Iceberg runtime jar. All table IO therefore
routes through this module: the parquet materialization keeps the same
layout and write/read semantics, and flipping `SPARK_GRAFT_TABLE_FORMAT`
(or passing fmt='iceberg') on a cluster with the jar switches every
caller to `format('iceberg')` with identity-partitioning DDL unchanged.

Write semantics shared by both backends:
- `mode='overwrite'` replaces the table (Iceberg: snapshot replace;
  parquet: directory overwrite — both atomic at the reader level since
  readers re-list on refresh);
- `partition_by` columns become Iceberg identity partitions / parquet
  `part=` dirs;
- dynamic partition overwrite (only touched partitions replaced) is the
  session default the checkpoint module relies on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def table_format(spark: SparkSession | None = None) -> str:
    """'iceberg' when requested AND the runtime has the extension."""
    fmt = os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "auto")
    if fmt == "parquet":
        return "parquet"
    if spark is not None:
        has_jar = "iceberg" in spark.conf.get(
            "spark.sql.extensions", ""
        ).lower()
        if fmt == "iceberg" and not has_jar:
            raise RuntimeError(
                "SPARK_GRAFT_TABLE_FORMAT=iceberg but no Iceberg extension "
                "is configured on this SparkSession"
            )
        return "iceberg" if has_jar else "parquet"
    return "parquet" if fmt == "auto" else fmt


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_within_by: list[str] | None = None,
) -> None:
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    fmt = table_format(df.sparkSession)
    if fmt == "iceberg":  # pragma: no cover - no jar in this sandbox
        w.format("iceberg").save(path)
    else:
        w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    fmt = table_format(spark)
    if fmt == "iceberg":  # pragma: no cover
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)
