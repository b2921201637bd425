"""In-process test of jobs/ingest.py (Etl.ingest lifecycle: load -> tile ->
pyramid -> write per level, with --resume and --crs reprojection)."""

import os
import sys

import numpy as np
import pytest


def _run(argv):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import importlib

    import ingest

    importlib.reload(ingest)
    old = sys.argv
    sys.argv = ["ingest.py"] + argv
    try:
        return ingest.main()
    finally:
        sys.argv = old


@pytest.fixture()
def corpus(spark, tmp_path):
    from tilegrid import fixtures

    path = str(tmp_path / "corpus")
    spark.createDataFrame(fixtures.images_table(24)).write.parquet(path)
    return path


def test_ingest_webmercator_and_resume(spark, corpus, tmp_path, capsys):
    from tilegrid import fixtures
    from tilegrid.grid import WEBMERCATOR_WORLD, lnglat_to_webmercator
    from tilegrid.meta import AttributeStore
    from tilegrid.sources.layer_io import read_layer

    out = str(tmp_path / "layers")
    rc = _run([
        "--corpus", corpus, "--out", out, "--name", "wm", "--zoom", "4",
        "--min-zoom", "3", "--crs", "webmercator", "--cores", "4",
    ])
    assert rc == 0
    store = AttributeStore(out)
    assert sorted(store.zooms("wm")) == [3, 4]
    meta = store.read_meta("wm", 4)
    assert meta.crs == "webmercator"
    # every image's WM-projected center must fall inside a written tile key
    got = {
        (r["col"], r["row"])
        for r in read_layer(spark, out, "wm", 4).select("col", "row").collect()
    }
    tbl = fixtures.images_table(24)
    x, y = lnglat_to_webmercator(tbl["lon"].to_numpy(), tbl["lat"].to_numpy())
    half = WEBMERCATOR_WORLD.xmax
    want = {
        (int(np.floor((xi + half) / (2 * half) * 16)),
         int(np.floor((half - yi) / (2 * half) * 16)))
        for xi, yi in zip(x, y)
    }
    assert want <= got
    # resume: a second run skips every level
    rc2 = _run([
        "--corpus", corpus, "--out", out, "--name", "wm", "--zoom", "4",
        "--min-zoom", "3", "--crs", "webmercator", "--cores", "4", "--resume",
    ])
    assert rc2 == 0
    err = capsys.readouterr().err
    assert err.count("already done") + err.count("skipped") >= 2


def test_ingest_custom_crs_requires_extent(spark, corpus, tmp_path):
    with pytest.raises(SystemExit):
        _run([
            "--corpus", corpus, "--out", str(tmp_path / "x"), "--zoom", "3",
            "--crs", "epsg:32633", "--cores", "4",
        ])
