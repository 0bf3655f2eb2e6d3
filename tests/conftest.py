import os
import shutil
import tempfile

import pytest

from no_jvm_wap_with_iceberg_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def warehouse(tmp_path):
    d = tmp_path / "warehouse"
    d.mkdir()
    yield str(d)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark_h(spark):
    """Alias fixture for hypothesis tests (function-scoped @given needs
    a session-scoped Spark to stay fast)."""
    return spark
