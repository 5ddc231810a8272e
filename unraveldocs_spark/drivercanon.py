"""Driver-canonicalization dtype contract shared by the local harness
(tools/check_correctness.py) and the pytest guard
(tests/test_driver_schema_guard.py).

The round driver compares Spark and DuckDB result frames after a pandas
canonicalization pass.  pandas widens several DuckDB types in ways the
canon then stringifies differently from Spark's integral output:

- ``SUM(BIGINT)`` (plain or windowed) returns HUGEINT (int128), which
  pandas converts to float64 → the driver hashes ``"30.0"`` where Spark
  gives ``"30"`` (the r3+r4 ``moving_window_stats`` / r4 ``vocab_drift``
  mismatches — rows and schema green, hash red).
- DECIMAL → float64, same stringification hazard.
- Spark INT vs DuckDB BIGINT is a driver schema/hash mismatch (int32 vs
  int64 pandas dtypes stringify the same but the driver compares dtypes).

This module declares the EXACT Spark-dtype ↔ DuckDB-type pairs the driver
canonicalizes identically.  Anything else — HUGEINT, UBIGINT, DECIMAL,
width mismatches, TIMESTAMP (engine-specific stringification) — is a
driver hazard and must be CAST in the oracle SQL (or re-shaped on the
Spark side) before a query ships.
"""

from __future__ import annotations

import re

# Spark simpleString -> set of driver-safe DuckDB DESCRIBE types.
SAFE_PAIRS: dict[str, frozenset[str]] = {
    "bigint": frozenset({"BIGINT"}),
    "int": frozenset({"INTEGER"}),
    "smallint": frozenset({"SMALLINT"}),
    "tinyint": frozenset({"TINYINT"}),
    "double": frozenset({"DOUBLE"}),
    "float": frozenset({"FLOAT", "REAL"}),
    "boolean": frozenset({"BOOLEAN"}),
    "string": frozenset({"VARCHAR"}),
    "date": frozenset({"DATE"}),
    "binary": frozenset({"BLOB"}),
}

_WIDENED = re.compile(r"HUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT|DECIMAL")


def describe_oracle(con, sql: str) -> dict[str, str]:
    """DuckDB result column -> type, via DESCRIBE (plans, never runs)."""
    rows = con.execute("DESCRIBE " + sql).fetchall()
    return {r[0]: r[1] for r in rows}


def dtype_hazards(spark_schema, duck_types: dict[str, str]) -> list[str]:
    """Return human-readable hazards for a (Spark schema, DuckDB types)
    pair.  Empty list == driver-safe."""
    out = []
    spark_types = {f.name: f.dataType.simpleString() for f in spark_schema.fields}
    for col, styp in spark_types.items():
        dtyp = duck_types.get(col)
        if dtyp is None:
            out.append(f"{col}: in Spark output but not in oracle output")
            continue
        safe = SAFE_PAIRS.get(styp)
        if safe is None:
            out.append(f"{col}: spark type {styp} has no driver-safe DuckDB pair")
        elif dtyp not in safe:
            hint = ""
            if _WIDENED.search(dtyp):
                hint = " (uncast SUM/DECIMAL? pandas widens this to float64)"
            out.append(f"{col}: spark={styp} vs duckdb={dtyp}{hint}")
    for col in duck_types:
        if col not in spark_types:
            out.append(f"{col}: in oracle output but not in Spark output")
    return out
