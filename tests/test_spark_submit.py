"""End-to-end `spark-submit --py-files` packaging contract (the
deployment path README documents for real clusters): the package is
zipped exactly as the README says, a driver script that imports ONLY
from the zip renders a pyramid in a fresh spark-submit process from a
neutral cwd, and the tile count matches the in-process render. Also
pins that session.get_spark defers to spark-submit's --master instead
of clobbering it with a hard-coded local[N]."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

from rastertiler_rs_spark.fixtures import images_parquet
from rastertiler_rs_spark.operators.render import render

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """\
import json, sys

from rastertiler_rs_spark.session import get_spark
from rastertiler_rs_spark.operators.render import render

src, out = sys.argv[1], sys.argv[2]
spark = get_spark("submit-e2e")
tiles = render(spark.read.parquet(src), 6, 8, tile_size=256)
result = {"master": spark.sparkContext.master, "n_tiles": tiles.count()}
with open(out, "w") as f:
    json.dump(result, f)
spark.stop()
"""


def _find_spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(pyspark.__path__[0], "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("no spark-submit binary available")


def _zip_package(path: str) -> None:
    # the README recipe: `zip -r rastertiler_rs_spark.zip rastertiler_rs_spark`
    pkg = os.path.join(REPO, "rastertiler_rs_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files_render(spark, tmp_path):
    submit = _find_spark_submit()
    zip_path = str(tmp_path / "rastertiler_rs_spark.zip")
    _zip_package(zip_path)
    job = tmp_path / "job.py"
    job.write_text(_JOB)
    out = tmp_path / "result.json"
    src = images_parquet(8)

    env = dict(os.environ)
    # the zip must be the ONLY import path for the package, and the
    # child must not inherit this box's parallelism override
    env.pop("PYTHONPATH", None)
    env.pop("SPARK_GRAFT_CPUS", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [submit, "--master", "local[3]", "--driver-memory", "4g",
         "--py-files", zip_path, str(job), src, str(out)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420)
    assert proc.returncode == 0, proc.stderr[-4000:]
    got = json.loads(out.read_text())

    # --master from spark-submit must win over the factory default
    assert got["master"] == "local[3]"
    expected = render(spark.read.parquet(src), 6, 8, tile_size=256).count()
    assert got["n_tiles"] == expected and expected > 0
