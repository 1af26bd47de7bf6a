from __future__ import annotations

import pytest

from fluent_plugin_opensearch_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, shuffle_partitions=4, app_name="tests")
    yield s
    s.stop()
