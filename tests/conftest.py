import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xoverrr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("xoverrr_tests", cores=int(os.environ.get("XOVERRR_TEST_CORES", "4")),
                  shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
