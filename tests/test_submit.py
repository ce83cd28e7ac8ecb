"""The north_rule deploy path: `spark-submit --py-files <pkg.zip>` runs
the whole pipeline from the shipped zip (imports resolve from the
archive, not the repo checkout), and a second submit over the same
output directory resumes from the committed checkpoints instead of
recomputing — the checkpoint-resumability requirement exercised through
the real submit entrypoint rather than the library API."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(out_dir: str) -> dict:
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "submit.py"),
            "--master",
            "local[4]",
            "--n-docs",
            "200",
            "--output",
            out_dir,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.slow
def test_spark_submit_runs_and_resumes(tmp_path):
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    out = str(tmp_path / "graph")

    first = _submit(out)
    assert "resolved" in first["stages_run"]
    assert first["metrics"]["resolved_rows"] > 0
    assert first["metrics"]["wide_rows"] > 0
    # the zip really shipped the package
    zip_path = os.path.join(REPO, "build", "oak_kg_spark.zip")
    assert os.path.exists(zip_path)
    for sub in ("wide", "triples", "resolved", "nodes", "metrics", "lineage"):
        assert os.path.exists(os.path.join(out, sub)), sub

    second = _submit(out)
    assert second["stages_run"] == []
    assert set(first["stages_run"]) <= set(second["stages_skipped"])
