from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Protobuf vendoring shim for the state-v2 tests (see pb_vendor/sitecustomize
# .py): install in THIS process, and export on PYTHONPATH BEFORE the JVM
# launches so every forked Python worker runs the same sitecustomize.
_PB_VENDOR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pb_vendor")
if _PB_VENDOR not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = (
        _PB_VENDOR + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _PB_VENDOR
    )
sys.path.insert(0, _PB_VENDOR)
import sitecustomize as _pb_shim  # noqa: F401  (runs _install at import)

from universal_aws_data_pipeline_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
