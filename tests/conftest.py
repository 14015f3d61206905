import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PYSPARKDB_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from pysparkdb.session import get_spark

    spark = get_spark("pysparkdb-tests", master="local[4]",
                      extra_confs={"spark.sql.shuffle.partitions": "8",
                                   "spark.ui.enabled": "false"})
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
