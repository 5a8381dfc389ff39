from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from fhirflat_spark.session import get_spark

    s = get_spark("tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
