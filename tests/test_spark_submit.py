"""The north rule's invocation contract: the engine runs via
``spark-submit --py-files pkg.zip`` with ALL imports resolving from the
shipped archive. Submitting from a temp cwd (repo nowhere on sys.path)
catches executor- AND driver-side import bugs that in-repo pytest hides;
a second submit against the same --out proves snapshot resume works
across separate spark-submit processes."""

from __future__ import annotations

import json
import shutil
import subprocess

import pytest

REPO = "/root/repo"
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _submit(job: str, zip_path: str, cwd: str, *job_args: str) -> dict:
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        job, *job_args,
    ]
    proc = subprocess.run(
        cmd, cwd=cwd, capture_output=True, text=True, timeout=420
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    payloads = [
        ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")
    ]
    assert payloads, f"no JSON line in stdout: {proc.stdout[-2000:]}"
    return json.loads(payloads[-1])


@pytest.mark.skipif(
    not shutil.which(SPARK_SUBMIT) and not shutil.which("spark-submit"),
    reason="spark-submit not on this box",
)
def test_submit_runs_from_pyfiles_zip_and_resumes(tmp_path):
    zip_path = shutil.make_archive(
        str(tmp_path / "newsraag_pkg"), "zip",
        root_dir=REPO, base_dir="newsraag_crawler_spark",
    )
    # the job script runs from a temp dir so imports CANNOT fall back to
    # the repo checkout — only the zip can satisfy them
    job = str(tmp_path / "crawl_wave_job.py")
    shutil.copyfile(f"{REPO}/scripts/crawl_wave_job.py", job)
    out_dir = str(tmp_path / "run")

    r1 = _submit(
        job, zip_path, str(tmp_path),
        "--out", out_dir, "--n-seeds", "400", "--waves", "2",
        "--links-per-page", "2", "--n-articles", "200",
    )
    assert r1["waves_run"] == 2 and r1["last_wave"] == 1
    assert len(r1["fetched_per_wave"]) == 2
    assert r1["fetched_per_wave"][0] > 0
    assert r1["corpus_rows"] == sum(r1["fetched_per_wave"])

    # second PROCESS, same --out: resume from snapshot lineage — waves
    # continue at 2 (--waves is the TOTAL ceiling, so 3 runs exactly one
    # more), committed rows are kept (corpus only grows)
    r2 = _submit(
        job, zip_path, str(tmp_path),
        "--out", out_dir, "--n-seeds", "400", "--waves", "3",
        "--links-per-page", "2", "--n-articles", "200",
    )
    assert r2["waves_run"] == 1 and r2["last_wave"] == 2, r2
    assert len(r2["fetched_per_wave"]) == 3
    assert r2["fetched_per_wave"][:2] == r1["fetched_per_wave"]
    assert r2["corpus_rows"] >= r1["corpus_rows"]
