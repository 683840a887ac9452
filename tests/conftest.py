import pytest


@pytest.fixture(scope="session")
def spark():
    from orc_rs_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4, app_name="orc_rs_spark-tests")
    yield s
    s.stop()
