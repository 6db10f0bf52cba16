from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from python_vector_db___ai_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# Plan-shape tests assert the pristine scan; the bench-only input
# rebalance flag must never leak into the test session's environment.
os.environ.pop("SPARK_GRAFT_REBALANCE", None)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()
