import pytest


@pytest.fixture(scope="session")
def spark():
    from linkgraph.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="linkgraph-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf0001():
    return "/root/testdata/sf0.001"
