from __future__ import annotations

import pytest

from ubeardw_databricks_lakehouse_spark.core.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ubeardw-tests", shuffle_partitions=8)
    yield s
