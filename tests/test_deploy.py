"""Deploy-path regression: under spark-submit, get_session must respect
the submitted --master instead of stomping it back to local[N] (which
would silently run a 'cluster' job single-JVM). Runs a real spark-submit
with --py-files against a 2-executor local-cluster."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

PROBE = """
import json
from cow_spark.session import get_session
spark = get_session(app_name="deploy-probe", ship_package=False)
got = spark.range(1000).selectExpr("sum(id) s").collect()[0].s
print(json.dumps({"master": spark.sparkContext.master, "sum": got}))
spark.stop()
"""


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this machine")
def test_spark_submit_master_survives_get_session(tmp_path):
    sys.path.insert(0, REPO)
    from cow_spark.session import _package_zip

    probe = tmp_path / "probe.py"
    probe.write_text(PROBE)
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local-cluster[2,2,1024]",
         "--py-files", _package_zip(), str(probe)],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    import json

    got = json.loads(line)
    assert got["master"] == "local-cluster[2,2,1024]"
    assert got["sum"] == 499500
