"""catalog.py — Iceberg-or-Parquet table IO (parquet fallback path)."""

from __future__ import annotations

import pytest

from search_engine_spark.catalog import read_table, table_format, write_table


def test_format_resolution(spark, monkeypatch):
    assert table_format(spark) == "parquet"  # no iceberg jar here
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "parquet")
    assert table_format(spark) == "parquet"
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "iceberg")
    with pytest.raises(RuntimeError, match="Iceberg"):
        table_format(spark)


def test_roundtrip_partitioned_sorted(spark, tmp_path):
    df = spark.createDataFrame(
        [(i % 3, i, f"v{i}") for i in range(30)], "part int, k long, v string"
    )
    p = str(tmp_path / "t")
    write_table(df, p, partition_by=["part"], sort_within_by=["k"])
    back = read_table(spark, p)
    assert back.count() == 30
    assert {r["part"] for r in back.select("part").distinct().collect()} == {0, 1, 2}
    import os

    assert sorted(d for d in os.listdir(p) if d.startswith("part=")) == [
        "part=0", "part=1", "part=2"
    ]
