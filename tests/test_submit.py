"""End-to-end test of the north rule's deployment form: the package
zipped and shipped via `spark-submit --py-files`, imported strictly
from the zip (cwd and PYTHONPATH point away from the repo), building a
real index through bench/submit_index_build.py.

This is the only test that exercises zipimport: package data files
(stop-word lists, the Public Suffix List) must load through
importlib.resources (pkgdata.read_data) — Path(__file__) access dies
inside a --py-files zip because Spark adds the archive to sys.path
without extracting it.
"""

from __future__ import annotations

import json
import os
import subprocess
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _zip_package(dest: Path) -> None:
    pkg = REPO / "search_engine_spark"
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(pkg.rglob("*")):
            if f.is_dir() or "__pycache__" in f.parts:
                continue
            zf.write(f, f.relative_to(REPO))


def test_spark_submit_pyfiles_builds_index(spark, tmp_path):
    zip_path = tmp_path / "search_engine_spark.zip"
    _zip_package(zip_path)

    out = tmp_path / "index"
    env = os.environ.copy()
    # make sure the only route to the package is the zip
    env.pop("PYTHONPATH", None)
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

    cmd = [
        "spark-submit",
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(zip_path),
        str(REPO / "bench" / "submit_index_build.py"),
        "--synth", "200",
        "--output", str(out),
        "--blocks", str(tmp_path / "blocks"),
    ]
    res = subprocess.run(
        cmd, cwd=tmp_path, env=env, capture_output=True, text=True, timeout=400
    )
    assert res.returncode == 0, res.stderr[-4000:]

    marked = [
        ln for ln in res.stdout.splitlines() if ln.startswith("INDEX_BUILD_RESULT ")
    ]
    assert marked, res.stdout[-2000:]
    info = json.loads(marked[-1].split(" ", 1)[1])
    # prepare_docs drops empty pages and latest_snapshot collapses
    # re-crawled urls, so fewer than the 200 synthesized docs survive
    assert 150 <= info["n_docs"] <= 200
    assert info["avgdl"] > 0

    # the artifacts are readable back in-process and consistent
    from search_engine_spark.operators.index_build import read_index

    idx = read_index(spark, str(out))
    assert idx.n_docs == info["n_docs"]
    assert idx.postings.count() > 0
    assert len(list((tmp_path / "blocks").glob("**/*.parquet"))) > 0
