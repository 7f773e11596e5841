"""The north-rule deployment contract: the engine ships via
``spark-submit --py-files <zip>`` (BASELINE.json: north_rule/star).

Builds the distribution zip with ``cli.py package``, then launches a
REAL ``spark-submit`` subprocess whose driver script imports
``br_archive_spark`` *from the zip only* (cwd is a temp dir, the repo
is scrubbed from every path variable) and runs encode → decode →
verify end to end. This is the same artifact + command a user would
hand to a 1000-executor cluster; only the master URL differs.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import json
import sys

import br_archive_spark  # resolved from the --py-files zip
from pyspark.sql import SparkSession, functions as F
from br_archive_spark.operators import (decode_table, encode_table,
                                        verify_roundtrip)

assert ".zip" in br_archive_spark.__file__, br_archive_spark.__file__

spark = (SparkSession.builder
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.adaptive.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

src = spark.range(2000).select(
    F.col("id").cast("string").alias("doc_id"),
    F.transform(F.sequence(F.lit(1), (F.col("id") % 37 + 1).cast("int")),
                lambda x: ((x * 2654435761) % 50000).cast("int"))
    .alias("tokens")).withColumn(
    "n_tok", F.size("tokens")).withColumn(
    "source", F.lit("synthetic")).cache()
enc = encode_table(src, num_parts=4)
res = verify_roundtrip(src, enc)
print("RESULT:" + json.dumps(res))
spark.stop()
"""


def test_spark_submit_py_files(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    # build the zip through the CLI surface
    out = subprocess.run(
        [sys.executable, "-m", "br_archive_spark.cli", "package"],
        capture_output=True, text=True, cwd=REPO,
        env=dict(os.environ, PYTHONPATH=REPO), check=True)
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)
    staged = str(tmp_path / "br_archive_spark.zip")
    shutil.copy(zip_path, staged)

    driver = tmp_path / "job.py"
    driver.write_text(DRIVER)

    # scrub the repo from the environment: the import must come from
    # the shipped zip, exactly as on a cluster node
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--py-files", staged, str(driver)],
        capture_output=True, text=True, cwd=str(tmp_path),
        env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("RESULT:")]
    assert line, proc.stdout[-2000:] + proc.stderr[-2000:]
    res = json.loads(line[-1][len("RESULT:"):])
    assert res["ok"] is True and res["rows"] == 2000
    assert res["mismatched_rows"] == 0
