import pytest


@pytest.fixture(scope="session")
def spark():
    from unraveldocs_spark.session import build_session

    spark = build_session(
        app_name="unraveldocs-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield spark
    spark.stop()
