"""spark-submit CLI entry (python -m gluon_ocr_spark): end-to-end job
incl. resume on re-run."""

import json
import subprocess
import sys


def test_cli_synthetic_job_and_resume(tmp_path):
    out = str(tmp_path / "warehouse")
    cmd = [
        sys.executable,
        "-m",
        "gluon_ocr_spark",
        "--synthetic",
        "30",
        "--out",
        out,
        "--master",
        "local[2]",
        "--partitions",
        "2",
    ]
    r1 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    stats1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert stats1["urls_processed"] == 30

    # second invocation: everything committed → nothing to do
    r2 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    stats2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert stats2["urls_processed"] == 0
