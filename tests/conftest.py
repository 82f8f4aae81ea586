import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aeon_sleap_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="aeon-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


# module-level handle for hypothesis tests (function-scoped fixtures interact
# badly with @given; the session is shared anyway)
@pytest.fixture(scope="session")
def spark_global():
    return get_spark(app_name="aeon-spark-tests", shuffle_partitions=8)
