"""End-to-end spark-submit --py-files smoke (the north rule's delivery
mode): package osmalyzer_spark into a zip, launch tools/submit_job.py
through the REAL spark-submit binary in its own JVM, and check outputs —
both the plain and the checkpointed (component-bucketed, resumable)
correlate paths."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _make_zip(tmp_path) -> str:
    zpath = str(tmp_path / "osmalyzer_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "osmalyzer_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _write_images(spark, tmp_path, n=300) -> str:
    from osmalyzer_spark.datagen import generate_images

    path = str(tmp_path / "images")
    generate_images(spark, n, seed=5, partitions=4).write.mode("overwrite").parquet(path)
    return path


def _submit(zpath, args, cwd) -> str:
    env = dict(os.environ)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=4g",
            "--py-files", zpath,
            os.path.join(REPO, "tools", "submit_job.py"),
            *args,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=cwd,
    )
    assert out.returncode == 0, out.stdout[-3000:] + "\n" + out.stderr[-3000:]
    return out.stdout


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_correlate_plain_and_checkpointed(spark, tmp_path):
    zpath = _make_zip(tmp_path)
    images = _write_images(spark, tmp_path)

    out_plain = str(tmp_path / "out_plain")
    stdout = _submit(
        zpath,
        ["--images", images, "--out", out_plain, "--job", "correlate", "--radius", "500"],
        cwd=str(tmp_path),
    )
    assert "done" in stdout
    plain = spark.read.parquet(os.path.join(out_plain, "correlations"))
    kinds = {r["kind"] for r in plain.select("kind").distinct().collect()}
    assert "matched" in kinds and plain.count() > 0

    out_ck = str(tmp_path / "out_ck")
    stdout = _submit(
        zpath,
        ["--images", images, "--out", out_ck, "--job", "correlate",
         "--radius", "500", "--checkpointed"],
        cwd=str(tmp_path),
    )
    assert "checkpointed correlation rows:" in stdout
    # checkpointed run leaves progress lineage + staged bucket layout
    assert os.path.exists(os.path.join(out_ck, "_progress"))
    assert os.path.exists(
        os.path.join(out_ck, "staged", "run1", "corr_input", "_STAGED")
    )
    # the checkpointed result equals the plain correlate on the same input
    ck_rows = spark.read.parquet(os.path.join(out_ck, "data"))
    matched_plain = plain.filter("kind like 'matched%'").count()
    matched_ck = ck_rows.filter("kind like 'matched%'").count()
    assert matched_ck == matched_plain
