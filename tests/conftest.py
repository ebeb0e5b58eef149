from __future__ import annotations

import pytest

from name_matching_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="nm_tests", shuffle_partitions=4)
    yield s
