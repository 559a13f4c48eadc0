"""North-rule launch path, end-to-end: package the engine as a zip and run
the extraction pipeline through ``spark-submit --py-files`` in a FRESH JVM
whose working directory is outside the repo — so the executors import the
package (and the C kernel sources that ride in the archive) from the zip
alone, exactly as a multi-executor cluster would receive it.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    exe = _spark_submit()
    if exe is None:
        pytest.skip("no spark-submit on PATH")

    # 1. the deployable artifact: the package tree zipped from the repo root
    zip_path = shutil.make_archive(
        str(tmp_path / "pdf_parse_new_spark"), "zip",
        root_dir=REPO, base_dir="pdf_parse_new_spark",
    )

    # 2. a small input table + the in-process expected result
    from pdf_parse_new_spark import fixtures
    from pdf_parse_new_spark.operators import extract

    inp = str(tmp_path / "in.parquet")
    out = str(tmp_path / "out")
    df = fixtures.make_transcripts_df(spark, n_convs=6, median_turns=5)
    df.write.parquet(inp)
    expected = {
        (r["conv_id"], r["turn_idx"], r["extracted_text"])
        for r in extract.extract_turns(df).select(
            "conv_id", "turn_idx", "extracted_text"
        ).collect()
    }

    # 3. submit from a neutral cwd: the package must come from --py-files
    workdir = tmp_path / "cwd"
    workdir.mkdir()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            exe, "--master", "local[4]", "--py-files", zip_path,
            os.path.join(REPO, "scripts", "run_pipeline.py"),
            "--input", inp, "--output", out, "--no-resume",
        ],
        cwd=str(workdir), env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    got = {
        (r["conv_id"], r["turn_idx"], r["extracted_text"])
        for r in spark.read.parquet(os.path.join(out, "data-full")).select(
            "conv_id", "turn_idx", "extracted_text"
        ).collect()
    }
    assert got == expected
