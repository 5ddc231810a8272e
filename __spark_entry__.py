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

# The round driver records CORRECTNESS rows for (at most) the FIRST 50
# queries in iteration order: CORRECTNESS_r02.json contains exactly the
# first 50 of the 58 registered queries, in registry order, and no others.
# Iteration order therefore decides what gets (re-)verified each round:
# 1. queries with NO green driver row ever (new queries land here
#    automatically) iterate first, in registry order;
# 2. the rest iterate by LEAST-RECENTLY-driver-verified (r6 rotation:
#    before this, ~70 early-landing queries kept their single green row
#    forever while the driver re-checked the same early-registry cohort
#    every round), ties in registry order.
# The per-round artifacts then union to full coverage AND stale greens
# rotate back through the driver as code evolves.


def _last_green_rounds() -> dict[str, int]:
    """query -> latest round whose in-repo CORRECTNESS_r*.json records a
    green row (rows+schema+hash match, no err).  Hash-less rows-only
    records do not count as green."""
    import glob
    import json
    import re

    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


_LAST_GREEN_ROUND = _last_green_rounds()
_DRIVER_VERIFIED_PRIOR_ROUNDS = frozenset(_LAST_GREEN_ROUND)


def _ordered(merged: dict) -> dict:
    names = list(merged)
    order = {k: i for i, k in enumerate(names)}
    ranked = sorted(
        names,
        key=lambda k: (
            _LAST_GREEN_ROUND.get(k, 0),  # never-green (0) first
            order[k],
        ),
    )
    return {k: merged[k] for k in ranked}


_ALL = _ordered({**REGISTRY, **TRAINING_REGISTRY, **ENTRY_REGISTRY})


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
