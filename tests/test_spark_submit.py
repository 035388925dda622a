"""The north rule's launch requirement, literally: the index build runs
via ``spark-submit --py-files dpr_spark.zip build_index.py`` with the
library shipped ONLY as the zip — the entry script is copied outside
the repo so its own sys.path insert can't find the package, proving the
cluster-ship path (executors receive the same zip) is what's imported.
A negative control without --py-files must fail on the import."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    w = shutil.which("spark-submit")
    if w:
        return w
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else ""


def _zip_package(dest: str) -> None:
    import dpr_spark

    pkg = os.path.dirname(os.path.abspath(dpr_spark.__file__))
    parent = os.path.dirname(pkg)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, parent))


@pytest.mark.slow
@pytest.mark.skipif(not _spark_submit(), reason="spark-submit not found")
def test_spark_submit_py_files_zip(tmp_path, pages_pdf):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            pages_pdf[["url", "text"]].head(100), preserve_index=False
        ),
        pages_path,
    )
    zip_path = str(tmp_path / "dpr_spark.zip")
    _zip_package(zip_path)
    # entry script copied OUT of the repo: its sys.path.insert points at
    # tmp_path, so dpr_spark is importable only through --py-files
    script = str(tmp_path / "build_index.py")
    shutil.copy(os.path.join(REPO, "build_index.py"), script)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    base = [
        _spark_submit(),
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
    ]
    out = subprocess.run(
        base
        + ["--py-files", zip_path, script,
           "--pages", pages_path, "--out", str(tmp_path / "idx"),
           "--no-blocks"],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "built index: 100 docs" in out.stdout, out.stdout[-2000:]

    # negative control: same launch WITHOUT the zip must fail to import
    out2 = subprocess.run(
        base
        + [script, "--pages", pages_path, "--out", str(tmp_path / "idx2"),
           "--no-blocks"],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert out2.returncode != 0
    assert "ModuleNotFoundError" in (out2.stderr + out2.stdout)
