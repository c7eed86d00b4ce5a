from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from yelpdatawarehouse_spark.session import get_spark

    s = get_spark(app_name="ydw-tests", cpus=8, **{"spark.sql.shuffle.partitions": "8"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
