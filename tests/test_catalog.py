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


class TestMergeTable:
    """K2 upsert sink (reference ON CONFLICT (url) DO UPDATE semantics,
    db.rs:87-118) — parquet copy-on-write emulation of Iceberg MERGE."""

    def test_upsert_updates_and_inserts(self, spark, tmp_path):
        from search_engine_spark.catalog import merge_table, read_table

        path = str(tmp_path / "pages")
        base = spark.createDataFrame(
            [(f"u{i}", f"old{i}") for i in range(10)], "url string, html string"
        )
        merge_table(base, path, keys=["url"])

        delta = spark.createDataFrame(
            [("u3", "NEW3"), ("u7", "NEW7"), ("u99", "NEW99")],
            "url string, html string",
        )
        merge_table(delta, path, keys=["url"])

        got = {r["url"]: r["html"] for r in read_table(spark, path).collect()}
        assert len(got) == 11
        assert got["u3"] == "NEW3" and got["u7"] == "NEW7"
        assert got["u99"] == "NEW99"
        assert got["u0"] == "old0"  # untouched row survives

    def test_partitioned_merge_rewrites_only_touched_parts(self, spark, tmp_path):
        import os

        from search_engine_spark.catalog import merge_table, read_table

        path = str(tmp_path / "parts")
        base = spark.createDataFrame(
            [(f"u{i}", i % 4, f"old{i}") for i in range(20)],
            "url string, part int, html string",
        )
        merge_table(base, path, keys=["url"], partition_by=["part"])
        mtimes = {
            d: os.path.getmtime(os.path.join(path, d))
            for d in os.listdir(path)
            if d.startswith("part=")
        }

        delta = spark.createDataFrame(
            [("u1", 1, "NEW1"), ("u100", 1, "NEW100")],
            "url string, part int, html string",
        )
        import time

        time.sleep(1.1)
        merge_table(delta, path, keys=["url"], partition_by=["part"])

        got = {r["url"]: r["html"] for r in read_table(spark, path).collect()}
        assert len(got) == 21
        assert got["u1"] == "NEW1" and got["u100"] == "NEW100"
        assert got["u5"] == "old5"
        # only part=1 was replaced on disk
        for d, old_m in mtimes.items():
            new_m = os.path.getmtime(os.path.join(path, d))
            if d == "part=1":
                assert new_m > old_m
            else:
                assert new_m == old_m, f"{d} was rewritten"

    def test_nested_partitioning_preserves_sibling_subparts(self, spark, tmp_path):
        """Review finding: with multi-column partition_by the first-level
        dir swap must NOT drop the target's untouched nested subparts
        (falls back to a full rewrite)."""
        from search_engine_spark.catalog import merge_table, read_table

        path = str(tmp_path / "nested")
        base = spark.createDataFrame(
            [(f"u{h}", "d1", h % 4, f"old{h}") for h in range(8)],
            "url string, d string, h int, html string",
        )
        merge_table(base, path, keys=["url"], partition_by=["d", "h"])
        delta = spark.createDataFrame(
            [("u1", "d1", 1, "NEW1")], "url string, d string, h int, html string"
        )
        merge_table(delta, path, keys=["url"], partition_by=["d", "h"])
        got = {r["url"]: r["html"] for r in read_table(spark, path).collect()}
        assert len(got) == 8
        assert got["u1"] == "NEW1"
        assert got["u2"] == "old2"  # sibling subpartition survived

    def test_null_partition_values_survive(self, spark, tmp_path):
        """Review finding: the pruning predicate must be null-safe — a
        null partition value selects its partition instead of dropping
        the kept rows."""
        from search_engine_spark.catalog import merge_table, read_table

        path = str(tmp_path / "nulls")
        base = spark.createDataFrame(
            [("u1", None, "old1"), ("u2", None, "old2"), ("u3", 1, "old3")],
            "url string, part int, html string",
        )
        merge_table(base, path, keys=["url"], partition_by=["part"])
        delta = spark.createDataFrame(
            [("u2", None, "NEW2")], "url string, part int, html string"
        )
        merge_table(delta, path, keys=["url"], partition_by=["part"])
        got = {r["url"]: r["html"] for r in read_table(spark, path).collect()}
        assert got == {"u1": "old1", "u2": "NEW2", "u3": "old3"}


def test_merge_key_moving_partitions_has_no_duplicate(spark, tmp_path):
    """Advisory r2: a key whose partition-column value CHANGES between
    target and source must not survive twice (stale row in the
    untouched partition + new row in the touched one). merge_table
    detects moved keys and falls back to the full rewrite."""
    from search_engine_spark.catalog import merge_table, read_table

    path = str(tmp_path / "moved")
    base = spark.createDataFrame(
        [("u0", 0, "old0"), ("u1", 1, "old1"), ("u2", 2, "old2")],
        "url string, part int, html string",
    )
    merge_table(base, path, keys=["url"], partition_by=["part"])

    # u1 moves from part=1 to part=3; part=1 itself is untouched by delta
    delta = spark.createDataFrame(
        [("u1", 3, "MOVED1")], "url string, part int, html string"
    )
    merge_table(delta, path, keys=["url"], partition_by=["part"])

    rows = read_table(spark, path).collect()
    got = {r["url"]: (r["part"], r["html"]) for r in rows}
    assert len(rows) == 3, rows  # no duplicate u1
    assert got["u1"] == (3, "MOVED1")
    assert got["u0"] == (0, "old0") and got["u2"] == (2, "old2")

    # review finding r3: the fallback full-rewrite must KEEP the
    # partitioned disk layout — an unpartitioned rewrite leaves root-
    # level files that corrupt the NEXT partitioned merge's dir-swap
    import os

    assert any(
        d.startswith("part=") for d in os.listdir(path)
    ), os.listdir(path)
    delta2 = spark.createDataFrame(
        [("u9", 2, "NEW9")], "url string, part int, html string"
    )
    merge_table(delta2, path, keys=["url"], partition_by=["part"])
    rows2 = read_table(spark, path).collect()
    got2 = {r["url"]: (r["part"], r["html"]) for r in rows2}
    assert len(rows2) == 4, rows2
    assert got2["u9"] == (2, "NEW9") and got2["u1"] == (3, "MOVED1")
