"""In-process test of jobs/corpus_qa.py (profile + skew + lossy QA +
phash dup census, with --resume)."""

import json
import os
import sys

import pytest


def _run(argv, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import importlib

    import corpus_qa

    importlib.reload(corpus_qa)
    old = sys.argv
    sys.argv = ["corpus_qa.py"] + argv
    try:
        rc = corpus_qa.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    return rc, out


@pytest.fixture()
def corpus(spark, tmp_path):
    from tilegrid import fixtures

    path = str(tmp_path / "corpus")
    spark.createDataFrame(fixtures.images_table(24)).write.parquet(path)
    return path


def test_qa_report_and_resume(spark, corpus, tmp_path, capsys):
    out_dir = str(tmp_path / "qa")
    rc, out = _run(["--corpus", corpus, "--out", out_dir], capsys)
    assert rc == 0
    report = json.loads(open(os.path.join(out_dir, "report.json")).read())
    assert report["n_rows"] == 24
    cols = {p["column"]: p for p in report["profile"]}
    assert cols["image_id"]["n_distinct"] == 24
    assert cols["image_id"]["n_nulls"] == 0
    # size-skew census covers the (w, h) shape distribution
    assert report["size_skew_top"]
    total_share = sum(s["share_ppm"] for s in report["size_skew_top"])
    assert 0 < total_share <= 1_000_000
    # fixtures alternate png/fjpg: lossy half present and all >= 40 dB
    assert report["lossy_qa"]["n_lossy"] == 12
    assert report["lossy_qa"]["n_psnr_ok"] == 12
    assert report["phash_dup_pairs"] >= 0
    assert os.path.exists(os.path.join(out_dir, "_qa.done"))

    # resume: marker short-circuits, report re-printed not recomputed
    rc2, out2 = _run(
        ["--corpus", corpus, "--out", out_dir, "--resume"], capsys
    )
    assert rc2 == 0 and "skipped" in out2
