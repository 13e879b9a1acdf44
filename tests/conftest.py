import pytest

from entity_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="entity-etl-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
