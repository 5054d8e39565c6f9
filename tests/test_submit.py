"""Deployment contract (north_rule): the pipeline runs via
``spark-submit --py-files smaph_spark.zip`` with the package resolved
from the zip, not the repo checkout."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files(tmp_path, spark):
    from smaph_spark.sources.synthetic import generate_files_corpus

    files, _, _ = generate_files_corpus(n_clusters=25, seed=11)
    inp = str(tmp_path / "files")
    out = str(tmp_path / "clusters")
    spark.createDataFrame(files).write.mode("overwrite").parquet(inp)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--conf", "spark.local.dir=/root/spark-local",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "run_pipeline.py"),
            "--input", inp, "--output", out,
            "--partition-buckets", "4",
            "--nif-output", str(tmp_path / "nif"),
        ],
        capture_output=True, text=True, timeout=280,
        cwd=str(tmp_path),  # NOT the repo: forces import from the zip
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert result["sha_violations"] == 0
    clusters = spark.read.parquet(out)
    assert clusters.count() == len(files)
    # --partition-buckets: Hive layout on cluster_bucket, all rows intact
    buckets = {d for d in os.listdir(out) if d.startswith("cluster_bucket=")}
    assert buckets and buckets <= {f"cluster_bucket={i}" for i in range(4)}
    assert "cluster_bucket" in clusters.columns
    # --nif-output: every record has exactly one turtle statement
    nif = spark.read.text(str(tmp_path / "nif"))
    assert nif.count() == len(files)
    assert nif.filter(~nif["value"].contains("taIdentRef")).count() == 0
