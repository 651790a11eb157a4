from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from samsa_spark.session import get_spark

    s = get_spark("samsa-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
