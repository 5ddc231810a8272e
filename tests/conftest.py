import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from unraveldocs_spark.session import build_session

    warehouse = tempfile.mkdtemp(prefix="unraveldocs-warehouse-")
    spark = build_session(
        app_name="unraveldocs-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield spark
    spark.stop()
    shutil.rmtree(warehouse, ignore_errors=True)
