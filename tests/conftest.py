import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from osm2pgsql_spark.session import get_spark

    s = get_spark("osm2pgsql-spark-tests", shuffle_partitions=4)
    yield s
    s.stop()
