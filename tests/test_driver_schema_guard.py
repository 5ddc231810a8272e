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

import duckdb
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry_mod
from unraveldocs_spark.drivercanon import describe_oracle, dtype_hazards

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

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


def test_oracle_dtypes_match_spark_dtypes(spark):
    """Oracle-side pass (r4 verdict item 2b): DESCRIBE every oracle_sql()
    in DuckDB and require the exact driver-safe Spark↔DuckDB dtype pair
    for every output column.  An uncast ``SUM(BIGINT)`` (HUGEINT) or
    DECIMAL-widened column is a driver-only hash mismatch — DuckDB's
    fetchall() int-ifies HUGEINT so value-level local compares provably
    cannot see it (the r3+r4 ``moving_window_stats`` / r4 ``vocab_drift``
    class).  DESCRIBE plans without executing, so this covers all
    oracles cheaply."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = entry_mod.oracle_sql()
    bad = {}
    for name, builder in entry_mod.queries().items():
        sql = sqls.get(name)
        if sql is None:
            continue
        schema = builder(spark, SF).schema  # lazy
        hz = dtype_hazards(schema, describe_oracle(con, sql))
        if hz:
            bad[name] = hz
    con.close()
    assert not bad, f"oracle-side driver-canon dtype hazards: {bad}"
