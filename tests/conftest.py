from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from parquet_near_storage_compute_spark.session import get_spark

    s = get_spark(
        app_name="pnsc-tests",
        master="local[8]",
        conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.driver.memory": "4g",
            # the runtime-bytes tests diff the status store's stage
            # counters; the default 1000-stage retention evicts history
            # mid-measurement once the (growing) suite has run enough
            # jobs before them — retain far past the suite's stage count
            "spark.ui.retainedStages": "100000",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle_dir() -> str:
    return SF_ORACLE
