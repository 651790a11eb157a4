from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# Central slow-test registry (driver profile): node ids listed in
# tests/slow_tests.txt get the `slow` marker here, and pytest.ini's
# `addopts = -m "not slow"` deselects them by default so the suite fits
# the external driver's verify window (the full 36-min run truncated it —
# VERIFY_r14). Every listed test is a property/randomized/lifecycle twin
# whose operator family keeps faster coverage in the default profile; the
# full suite stays the round-close artifact (`pytest tests/ -q -m ""`).
_SLOW_IDS = frozenset(
    line.strip()
    for line in (Path(__file__).parent / "slow_tests.txt").read_text().splitlines()
    if line.strip()
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        # item.nodeid is repo-relative ("tests/test_x.py::test_y[param]");
        # the registry stores the unparametrized id, so strip any param.
        base = item.nodeid.split("[", 1)[0]
        if item.nodeid in _SLOW_IDS or base in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    from samsa_spark.session import get_spark

    s = get_spark("samsa-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
