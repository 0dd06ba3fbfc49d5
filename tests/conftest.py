from __future__ import annotations

import pytest

from snowy_json_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("snowy-json-spark-tests", cores=4)
    yield s
    s.stop()
