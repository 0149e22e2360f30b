"""The north rule's literal deployment shape: ``spark-submit --py-files``.

``BASELINE.json`` requires the engine to "run via spark-submit --py-files on
a multi-executor cluster". This drives exactly that launch path in the
sandbox: the package is zipped (tools/make_pyfiles_zip.py), the repo is NOT
on the Python path (cwd is a temp dir, PYTHONPATH scrubbed), and
``spark-submit --py-files <zip> kafka_connect_plugins_spark/main.py``
must resolve every import — driver side AND executor Python workers —
from the archive alone.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("no spark-submit on this host")


@pytest.mark.slow
def test_spark_submit_pyfiles_demo(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_pyfiles_zip import build_zip

    zip_path = build_zip(str(tmp_path / "kafka_connect_plugins_spark.zip"))
    # byte-identical rebuild — executor-side file caches key on content
    rebuilt = build_zip(str(tmp_path / "again.zip"))
    assert open(zip_path, "rb").read() == open(rebuilt, "rb").read()

    # primary script copied OUT of the repo: everything it imports must
    # come from the --py-files archive, as it would on a real cluster
    script = tmp_path / "main.py"
    shutil.copy(os.path.join(REPO, "kafka_connect_plugins_spark", "main.py"), script)

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in {"PYTHONPATH", "SPARK_HOME"}
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(script),
            "--demo",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["events"] == 10_000
    assert summary["final_rows"] > 0
