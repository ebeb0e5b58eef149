"""North-rule deployment shape: the pipeline must run via
``spark-submit --py-files nm_spark.zip`` (BASELINE.json north_rule /
reference makefile's Rscript-per-stage analogue). This executes the REAL
submission path — package zipped, job file copied OUTSIDE the repo so
``name_matching_spark`` can resolve ONLY from the ``--py-files`` zip on
driver and executor workers — and checks the job's cluster output.

Kept to one end-to-end submission (sf0.001, local[4]) because each
spark-submit pays a full JVM + session startup.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest


def _repo_root() -> str:
    import name_matching_spark

    return os.path.dirname(os.path.dirname(os.path.abspath(name_matching_spark.__file__)))


def test_spark_submit_pyfiles_resolve_job(tmp_path):
    spark_submit = shutil.which("spark-submit") or (
        "/opt/spark/bin/spark-submit"
        if os.path.exists("/opt/spark/bin/spark-submit")
        else None
    )
    if spark_submit is None:
        pytest.skip("spark-submit not found (PATH or /opt/spark/bin)")
    repo = _repo_root()

    # the deployment artifact: the package at the zip root, py files only
    pkg_zip = tmp_path / "nm_spark.zip"
    pkg_dir = os.path.join(repo, "name_matching_spark")
    with zipfile.ZipFile(pkg_zip, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))

    # job file OUTSIDE the repo: its repo-root sys.path bootstrap then
    # points at tmp_path (no package there), so an import that succeeds
    # proves the --py-files zip carried the code
    jobs_dir = tmp_path / "jobs"
    jobs_dir.mkdir()
    shutil.copy(os.path.join(repo, "jobs", "resolve_job.py"), jobs_dir)

    env = os.environ.copy()
    # reuse the repo's cached deterministic fixtures (no regeneration)
    env["SPARK_GRAFT_FIXTURES"] = os.path.join(repo, "data", "fixtures")
    env.pop("PYTHONPATH", None)  # nothing may leak the package in
    out_dir = tmp_path / "out"
    r = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--py-files",
            str(pkg_zip),
            str(jobs_dir / "resolve_job.py"),
            "--fixtures",
            "sf0.001",
            "--output",
            str(out_dir),
            "--checkpoint",
            str(tmp_path / "ckpt"),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=850,
    )
    assert r.returncode == 0, r.stderr[-4000:]

    # the job prints one JSON summary line on stdout
    summary = None
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                doc = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(doc, dict) and "clusters_rows" in doc:
                summary = doc
    assert summary is not None, r.stdout[-2000:]
    assert summary["clusters_rows"] > 0
    assert summary["stages"]  # per-stage lineage recorded

    # cluster table is real parquet with the contract columns
    import pyarrow.parquet as pq

    tbl = pq.read_table(str(out_dir))
    assert tbl.num_rows == summary["clusters_rows"]
    assert {"name", "cluster"} <= set(tbl.schema.names)
