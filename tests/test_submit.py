"""The north-rule deployment path: ``spark-submit --py-files <zip>``.

Builds dist/netascore_spark.zip with tools/make_pyfiles.py and runs
jobs/score_network.py under a real spark-submit from a NEUTRAL cwd, so
``import netascore_spark`` (and the mode-profile YAMLs when the repo
checkout is absent) must resolve from the shipped archive — exactly what
every executor on a real cluster does."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit binary")
def test_pyfiles_zip_submit(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_pyfiles

    zip_path = make_pyfiles.build(REPO, str(tmp_path))
    with zipfile.ZipFile(zip_path) as z:
        names = z.namelist()
    assert "netascore_spark/__init__.py" in names
    assert "netascore_spark/pipeline/network.py" in names
    assert "profiles/profile_bike.yml" in names
    assert not any("__pycache__" in n for n in names)

    # run the job from tmp_path (NOT the repo) so the package resolves
    # from the zip; the job script itself ships fine-grained (a real
    # submit copies it to the driver the same way)
    job = os.path.join(tmp_path, "score_network.py")
    shutil.copy(os.path.join(REPO, "jobs", "score_network.py"), job)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            job, "--scale", "2",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("scored_edges=")]
    assert lines, out.stdout[-2000:]
    assert int(lines[0].split("=")[1]) > 0


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit binary")
def test_pyfiles_zip_submit_curate(tmp_path):
    """The webtext twin: jobs/curate_corpus.py under a real spark-submit
    from a neutral cwd, package resolving from the zip.  The synthetic
    corpus plants 10% exact and 10% near duplicates, so the curated count
    is exactly 80% of the input — a value the whole chain (gate, exact
    dedup, pair join, components, splits) must cooperate to produce."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_pyfiles

    zip_path = make_pyfiles.build(REPO, str(tmp_path))
    job = os.path.join(tmp_path, "curate_corpus.py")
    shutil.copy(os.path.join(REPO, "jobs", "curate_corpus.py"), job)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            job, "--synthetic-docs", "2000", "--threshold", "0.7",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [l for l in out.stdout.splitlines()
             if l.startswith("curated_docs=")]
    assert lines, out.stdout[-2000:]
    assert lines[0].split()[0] == "curated_docs=1600", lines[0]
