import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_spark.session import get_spark  # noqa: E402

# keep unit tests snappy; the bench/driver uses local[32]
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="whisper_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def store_path(tmp_path):
    return str(tmp_path / "store")


def sf_dir(sf: str = "0.001") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", f"/root/testdata/sf{sf}")
