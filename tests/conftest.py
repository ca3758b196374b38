from __future__ import annotations

import pytest

from streamprocess_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="streamprocess-tests", shuffle_partitions=8)
    yield s
    s.stop()
