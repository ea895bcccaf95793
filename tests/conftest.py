import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ocr_corrector_spark.session import get_spark

    s = get_spark(
        app_name="tests",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        # static conf — must be set at session creation; managed tables
        # (bucketing tests) must never land inside the repo's cwd
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark_graft_test_warehouse"},
    )
    yield s
    s.stop()
