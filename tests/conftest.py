import pytest


@pytest.fixture(scope="session")
def spark():
    from tilegrid.session import get_spark

    s = get_spark("tilegrid-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
