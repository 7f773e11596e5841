import pytest


@pytest.fixture(scope="session")
def spark():
    from br_archive_spark.plans import get_spark

    spark = get_spark("local[4]", app_name="br-archive-spark-tests",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
