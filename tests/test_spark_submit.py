"""Launch-mode gate (BASELINE.json:6,14): the job runs via
``spark-submit --py-files <package.zip>`` — the packaged module import
path, not the repo checkout, serves the executors."""

import json
import os
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    pkg_zip = str(tmp_path / "wads.zip")
    pkg_dir = os.path.join(REPO, "web_archive_downloader_spark")
    with zipfile.ZipFile(pkg_zip, "w") as zf:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the import source
    p = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", pkg_zip,
            "--conf", "spark.ui.enabled=false",
            # also covers the submit_job contract that an explicit
            # --conf beats its local default of 16
            "--conf", "spark.sql.shuffle.partitions=4",
            os.path.join(REPO, "submit_job.py"),
            "12",  # JVM launch dominates; 12 urls exercise the contract
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # not the repo: forces zip-based imports
        timeout=480,
    )
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert p.returncode == 0, p.stderr[-3000:]
    assert lines, p.stdout[-2000:]
    out = json.loads(lines[-1])
    assert out["ok"] and out["docs"] > 0 and out["epochs"] >= 1
