"""The north-rule ship path: ``spark-submit --py-files dist/remilia_spark.zip``.

Reference parity: remilia ships as a ``go get``-able library (`README.md:31-38`);
our cluster deliverable is the zip + ``jobs/crawl_job.py`` pair.  This test runs
the REAL ``spark-submit`` binary from a neutral working directory with an empty
``PYTHONPATH`` so every ``remilia_spark`` import must resolve from the zip —
proving the artifact is self-contained (a stale zip or a missing submodule
fails here, not on the cluster).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _spark_submit() -> str | None:
    cand = Path(os.environ.get("SPARK_HOME", "/opt/spark")) / "bin" / "spark-submit"
    if cand.exists():
        return str(cand)
    return shutil.which("spark-submit")


def test_py_files_zip_is_self_contained(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit binary on this host")

    # fresh zip from the current tree (a stale dist/ must not mask breakage)
    sys.path.insert(0, str(ROOT / "jobs"))
    try:
        import package as packager
        zip_path = packager.build(tmp_path / "remilia_spark.zip")
    finally:
        sys.path.pop(0)

    from remilia_spark.corpus import generate_corpus

    corpus = tmp_path / "corpus"
    generate_corpus(n_pages=200, n_hosts=5, seed=7, n_seeds=3).write(corpus)

    # run from tmp_path with a copied job script: crawl_job.py's local-dev
    # fallback (repo root on sys.path) cannot fire, so imports come from
    # the zip or nowhere
    job = tmp_path / "crawl_job.py"
    job.write_text((ROOT / "jobs" / "crawl_job.py").read_text())
    env = {**os.environ, "PYTHONPATH": ""}
    proc = subprocess.run(
        [submit, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path), str(job),
         "--corpus", str(corpus), "--state", str(tmp_path / "state"),
         "--max-depth", "2", "--max-supersteps", "8"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]

    lines = [json.loads(l) for l in proc.stdout.splitlines()
             if l.startswith("{")]
    done = [l for l in lines if l.get("done")]
    assert done, f"no done line in stdout: {proc.stdout[-2000:]}"
    assert done[0]["fetched_total"] > 0
