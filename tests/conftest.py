from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))  # fixtures.py
sys.path.insert(0, str(Path(__file__).parent.parent))


@pytest.fixture(scope="session")
def spark():
    from varint_spark.session import get_spark

    s = get_spark("varint_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
