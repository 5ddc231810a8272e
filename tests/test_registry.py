"""Driver-contract integrity: the three query registries must not
shadow each other, every entry needs a builder and exactly one oracle
form, and oracle_sql() must cover every query."""

import __spark_entry__ as entry_mod
from unraveldocs_spark.entry_queries import ENTRY_REGISTRY
from unraveldocs_spark.queries import REGISTRY
from unraveldocs_spark.trainingdata import TRAINING_REGISTRY


def test_no_name_collisions():
    a, b, c = set(REGISTRY), set(TRAINING_REGISTRY), set(ENTRY_REGISTRY)
    assert not (a & b), a & b
    assert not (a & c), a & c
    assert not (b & c), b & c


def test_every_entry_well_formed():
    for name, spec in {**REGISTRY, **TRAINING_REGISTRY, **ENTRY_REGISTRY}.items():
        assert callable(spec["builder"]), name
        has_sql = spec.get("sql") is not None
        has_fn = spec.get("sql_fn") is not None
        assert has_sql or has_fn, f"{name} lacks an oracle"
        assert not (has_sql and has_fn), f"{name} has two oracle forms"


def test_oracle_sql_covers_every_query():
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert set(qs) == set(sqls)
    assert all(isinstance(s, str) and s.strip() for s in sqls.values())
