import pytest

from osmalyzer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("osmalyzer-tests", parallelism=8, shuffle_partitions=8)
    yield s
