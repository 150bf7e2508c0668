import shutil
import tempfile

import pytest

from crawld_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawld_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def warehouse():
    d = tempfile.mkdtemp(prefix="crawld_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
