import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapbox_filter_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    cores = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    s = build_session(cores=cores, app_name="mfs-tests")
    yield s


def sf_dir(sf: str = "0.001") -> str:
    return f"/root/testdata/sf{sf}"
