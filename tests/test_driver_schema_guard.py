"""Driver-canonicalization schema guard.

The round driver's compare harness canonicalizes each result frame with
pandas: it factorizes every column (array/map/struct values raise
``TypeError: unhashable type`` — the r3 ``fuzzy_search`` crash) and
stringifies timestamps engine-specifically (raw TIMESTAMP columns hash
differently between Spark- and DuckDB-collected frames — the r3
``moving_window_stats`` mismatch).  This test builds every registry
DataFrame (schema only, no execution) and rejects both hazards so they
can never recur.
"""

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

_BANNED_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _hazards(schema):
    out = []
    for f in schema.fields:
        if isinstance(f.dataType, _BANNED_COMPLEX):
            out.append(f"{f.name}: {f.dataType.simpleString()} (non-scalar)")
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            out.append(f"{f.name}: raw timestamp (emit unix epoch instead)")
    return out


def test_no_driver_hostile_output_columns(spark):
    bad = {}
    for name, builder in entry_mod.queries().items():
        df = builder(spark, SF)  # lazy: builds the plan, never executes
        hz = _hazards(df.schema)
        if hz:
            bad[name] = hz
    assert not bad, f"driver-canon hazards: {bad}"
