from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
# default oracle scale is sf0.01: sf0.001 is tiny enough to hide
# cardinality bugs (round-2 verdict item 5); override to go smaller
# for quick local iteration or bigger for soak runs
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")
    from gcs2postgres_spark.session import get_spark

    s = get_spark("gcs2postgres_spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE
