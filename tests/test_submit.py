"""North-rule launch-mode parity: the engine runs via
`spark-submit --py-files table2qb_spark.zip` with no repo checkout on the
PYTHONPATH (BASELINE.json north_rule / north_star launch mode)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "spark-submit")


def _build_zip(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles_zip import build
    finally:
        sys.path.pop(0)
    return build(str(tmp_path / "table2qb_spark.zip"))


def _submit(zip_path, cwd, *task_args, timeout=240):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "4"
    return subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(REPO, "tools", "spark_submit_launcher.py"), *task_args],
        capture_output=True, text=True, timeout=timeout, cwd=cwd, env=env,
    )


@pytest.mark.skipif(
    not any(
        os.access(os.path.join(p, "spark-submit"), os.X_OK)
        for p in os.environ.get("PATH", "").split(os.pathsep)
    ),
    reason="spark-submit not on PATH",
)
def test_spark_submit_pyfiles_runs_cdc_flow(tmp_path):
    zip_path = _build_zip(tmp_path)
    # cwd OUTSIDE the repo: the package must resolve from the zip alone
    work = tmp_path / "outside"
    work.mkdir()
    ev, lake = str(tmp_path / "ev"), str(tmp_path / "lake")

    r = _submit(zip_path, str(work), "datagen", "--out", ev,
                "--events-n", "2000", "--repos", "6",
                "--paths-per-repo", "20", "--files", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    r = _submit(zip_path, str(work), "cdc-init", "--table", lake, "--buckets", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    r = _submit(zip_path, str(work), "cdc-replay", "--table", lake,
                "--events", ev, "--batch-events", "1000")
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["batches_applied"] == 2 and stats["rows"] > 0
