"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose the operator inventory (SURVEY.md §2)
plus the training-data operators, each with a DuckDB oracle where the
semantics are SQL-expressible (rows-only otherwise; those are verified
against pure-Python oracles in tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)
# python workers resolve module-referenced mapInPandas functions via
# PYTHONPATH; set it before any SparkSession (and its workers) exist
if _REPO_DIR not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_DIR + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _REPO_DIR
    )

from unraveldocs_spark.entry_queries import ENTRY_REGISTRY  # noqa: E402
from unraveldocs_spark.queries import REGISTRY  # noqa: E402
from unraveldocs_spark.trainingdata import TRAINING_REGISTRY  # noqa: E402

_ALL = {**REGISTRY, **TRAINING_REGISTRY, **ENTRY_REGISTRY}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the extraction pipeline end-to-end on sf0.001 —
    derived transcripts -> salted repartition -> sortWithinPartitions ->
    Arrow-batched mapInPandas extraction."""
    from unraveldocs_spark.entry_queries import q_extract_turns

    return q_extract_turns(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec["builder"] for name, spec in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, spec in _ALL.items():
        sql = spec.get("sql")
        if sql is None and spec.get("sql_fn") is not None:
            sql = spec["sql_fn"]()
        if sql is not None:
            out[name] = sql
    return out
