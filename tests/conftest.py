import shutil
import tempfile

import pytest

from estuary_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("estuary-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="estuary-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
