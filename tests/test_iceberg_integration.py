"""Iceberg integration: executes the string-pinned checkpoint SQL
(checkpoint.py's iceberg_* builders + IcebergCheckpointStore) against a
REAL hadoop-type catalog.  Auto-skips when no iceberg-spark-runtime jar
is on the classpath — the sandbox ships none — and goes green unchanged
the moment one lands (r5 VERDICT #5 standing item).

Run standalone (`pytest tests/test_iceberg_integration.py`): the module
builds its own SparkSession with the Iceberg extensions, which cannot be
retrofitted onto an already-running context, so it also skips if a
non-Iceberg session is already active in this JVM.
"""

import glob
import os

import pytest


def _iceberg_jar() -> str | None:
    """An iceberg-spark-runtime jar, if one is visible: explicit env
    override first, then pyspark's own jars dir, then /opt/jars."""
    env = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    import pyspark

    for root in (os.path.join(os.path.dirname(pyspark.__file__), "jars"),
                 "/opt/jars"):
        hits = sorted(glob.glob(os.path.join(root, "iceberg-spark-runtime*.jar")))
        if hits:
            return hits[0]
    return None


_JAR = _iceberg_jar()

pytestmark = pytest.mark.skipif(
    _JAR is None,
    reason="no iceberg-spark-runtime jar in this environment "
    "(set SPARK_GRAFT_ICEBERG_JAR to enable)",
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        ext = active.conf.get("spark.sql.extensions", "")
        if "IcebergSparkSessionExtensions" not in ext:
            pytest.skip(
                "a non-Iceberg SparkSession is already active; run this "
                "module standalone"
            )
        yield active
        return
    warehouse = str(tmp_path_factory.mktemp("iceberg-warehouse"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-integration")
        .config("spark.jars", _JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def store(iceberg_spark):
    from unraveldocs_spark.checkpoint import IcebergCheckpointStore

    iceberg_spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
    iceberg_spark.sql(
        "CREATE TABLE local.db.results "
        "(conv_id STRING, turn_idx INT, text STRING) USING iceberg"
    )
    iceberg_spark.sql(
        "CREATE TABLE local.db.lineage "
        "(run_id STRING, part_id INT, n_rows BIGINT) USING iceberg"
    )
    return IcebergCheckpointStore("local.db.results", "local.db.lineage",
                                  iceberg_spark)


def _rows(spark, table):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in spark.read.table(table).collect()
    }


def test_append_stamps_run_id_for_resume(iceberg_spark, store):
    """append + has_run is the kill-and-resume contract: the run_id rides
    the snapshot summary and a replayed micro-batch sees it."""
    df = iceberg_spark.createDataFrame(
        [("c1", 0, "hello"), ("c1", 1, "world")],
        "conv_id string, turn_idx int, text string",
    )
    lineage = iceberg_spark.createDataFrame(
        [("run-A", 0, 2)], "run_id string, part_id int, n_rows bigint"
    )
    store.append(df, lineage=lineage, run_id="run-A")
    assert store.has_run("run-A")
    assert not store.has_run("run-B")
    assert _rows(iceberg_spark, "local.db.results") == {
        ("c1", 0): "hello",
        ("c1", 1): "world",
    }
    assert store.lineage(iceberg_spark).count() == 1


def test_merge_upsert_replaces_by_key(iceberg_spark, store):
    updates = iceberg_spark.createDataFrame(
        [("c1", 1, "WORLD!"), ("c2", 0, "new")],
        "conv_id string, turn_idx int, text string",
    )
    store.upsert(updates, iceberg_spark)
    assert _rows(iceberg_spark, "local.db.results") == {
        ("c1", 0): "hello",
        ("c1", 1): "WORLD!",
        ("c2", 0): "new",
    }


def test_merge_delete_retracts_by_key(iceberg_spark, store):
    keys = iceberg_spark.createDataFrame(
        [("c1", 0)], "conv_id string, turn_idx int"
    )
    store.delete(keys, iceberg_spark)
    rows = _rows(iceberg_spark, "local.db.results")
    assert ("c1", 0) not in rows and len(rows) == 2


def test_maintenance_procedures_execute(iceberg_spark, store):
    from unraveldocs_spark.checkpoint import iceberg_maintenance_sql

    rewrite, expire = iceberg_maintenance_sql(
        "local.db.results", retain_last=1
    )
    iceberg_spark.sql(rewrite).collect()
    iceberg_spark.sql(expire).collect()
    # history survives with at least the retained floor
    assert iceberg_spark.sql(
        "SELECT COUNT(*) AS n FROM local.db.results.snapshots"
    ).collect()[0]["n"] >= 1
