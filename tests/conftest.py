import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Tests build many short-lived sessions (fixtures + CLI/replay
# subprocesses); suite speed matters more than first-query latency, so
# the session JIT warmup is off here — subprocess children inherit it.
os.environ.setdefault("SPARK_GRAFT_SESSION_WARM", "0")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pipeline_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
