from __future__ import annotations

import pytest

from whiterrabbit_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="wrs-tests", cpus=4, shuffle_partitions=8)
    yield s


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"
