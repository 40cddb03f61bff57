"""A11/A12 analogue: shipping an extractor environment to Spark workers.

The reference provisions a venv per extractor and pip-installs its
packages on the single machine that runs the extraction
(``MardaExtractor.__init__``/``install``, ``__init__.py:157-217``). On a
cluster, per-task pip installs don't scale and aren't hermetic; the
Spark-idiomatic equivalent ships a PACKED ENVIRONMENT to every executor
once per application:

Cluster recipe (run where you build the job):

    python -m venv /tmp/yadg-env
    /tmp/yadg-env/bin/pip install 'yadg~=5.0' venv-pack   # the registry
    /tmp/yadg-env/bin/venv-pack -o yadg-env.tar.gz        # entry's pkgs

    spark-submit \
      --archives yadg-env.tar.gz#environment \
      --conf spark.pyspark.python=./environment/bin/python \
      job.py

    # (equivalently: SparkSession.builder
    #    .config("spark.archives", "yadg-env.tar.gz#environment")
    #    .config("spark.pyspark.python", "./environment/bin/python"))

Every executor unpacks the archive into its working directory; worker
Python is the venv's interpreter, so ``import_module(setup)`` — the
reference's A16 step — resolves the registry's extractor package with
zero per-task installs. One archive per extractor id mirrors the
reference's env-per-entry layout.

This file DEMONSTRATES the mechanics end-to-end in a way that runs in
this container (no pip, no network): it packs a pure-python extractor
package into a tar.gz, ships it with ``SparkContext.addArchive`` (the
runtime form of ``spark.archives``), and imports it INSIDE a worker
from the extracted archive — proving the distribution path the venv
recipe rides on.

Run: python examples_venv.py
"""

from __future__ import annotations

import os
import sys
import tarfile
import tempfile
import textwrap

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EXTRACTOR_SRC = textwrap.dedent(
    '''
    """Fixture extractor package, shipped via spark.archives."""

    def extract(path):
        return f"extracted:{path}:by-archived-pkg"
    '''
)


def build_archive() -> str:
    """Pack a minimal extractor package the way venv-pack would pack a
    full environment (same tar.gz + fragment-name mechanics)."""
    base = tempfile.mkdtemp(prefix="mdx_venv_demo_")
    pkg = os.path.join(base, "demo_extractor_pkg")
    os.makedirs(pkg)
    with open(os.path.join(pkg, "__init__.py"), "w") as fh:
        fh.write(EXTRACTOR_SRC)
    tar_path = os.path.join(base, "demo_env.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tar:
        tar.add(pkg, arcname="demo_extractor_pkg")
    return tar_path


def main() -> None:
    from pyspark import SparkFiles
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[4]").appName("mdx-venv-demo").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    tar_path = build_archive()
    # Runtime form of --archives / spark.archives: every executor gets
    # the archive extracted under its SparkFiles root.
    spark.sparkContext.addArchive(f"{tar_path}#extenv")

    def run_extractor(path: str) -> str:
        # Executes INSIDE the worker: resolve the extracted archive,
        # put it on sys.path, import the shipped package, invoke it --
        # exactly what a venv-shipped extractor does via PYSPARK_PYTHON.
        import importlib
        import sys as worker_sys

        root = SparkFiles.get("extenv")
        if root not in worker_sys.path:
            worker_sys.path.insert(0, root)
        mod = importlib.import_module("demo_extractor_pkg")
        return mod.extract(path)

    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    extract_udf = F.udf(run_extractor, StringType())
    df = spark.createDataFrame(
        [(1, "/data/gcpl.mpr"), (2, "/data/ocv.mpr")], "file_id long, path string"
    )
    out = df.select("file_id", extract_udf("path").alias("result")).collect()
    for row in out:
        print(row["file_id"], row["result"])
    assert all(r["result"].startswith("extracted:") for r in out)
    print("archive-shipped extractor executed in workers: OK")


if __name__ == "__main__":
    main()
