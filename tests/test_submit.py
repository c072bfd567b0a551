"""spark-submit --py-files packaging (north rule): the zip + job script
must run end-to-end in a fresh spark-submit process."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_spark_submit_py_files(spark, tmp_path):
    from langid_mr_spark import fixtures

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    fixtures.corpus_df(spark, 40, num_partitions=2).write.parquet(inp)

    sys.path.insert(0, str(REPO / "scripts"))
    import package as pkg
    zip_path = pkg.build(tmp_path / "langid_mr_spark.zip")

    spark_submit = Path(sys.executable).parent / "spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    env["PYSPARK_PYTHON"] = sys.executable
    res = subprocess.run(
        [str(spark_submit), "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path),
         str(REPO / "scripts" / "job.py"),
         "--input", inp, "--output", out, "--run-id", "t1"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),  # NOT the repo root: no implicit package import
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "processed_partitions=" in res.stdout
    got = spark.read.parquet(out)
    assert got.count() == 40
    assert "final_keep" in got.columns
