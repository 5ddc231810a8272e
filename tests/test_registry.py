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


def test_unverified_queries_iterate_first():
    """The round driver records CORRECTNESS rows for only the first ~50
    queries in iteration order (CORRECTNESS_r02.json == first 50 of 58,
    exactly, in order). Queries without a prior green driver row — which
    includes every newly added query — must therefore iterate before the
    already-verified ones, so per-round artifacts union to full coverage."""
    names = list(entry_mod.queries())
    verified = entry_mod._DRIVER_VERIFIED_PRIOR_ROUNDS
    seen_verified = False
    for n in names:
        if n in verified:
            seen_verified = True
        else:
            assert not seen_verified, (
                f"unverified query {n!r} iterates after a verified one"
            )
    # the prior-round set must only name queries that still exist
    assert verified <= set(names), verified - set(names)


def test_back_block_rotates_by_least_recently_verified():
    """r6 rotation: already-green queries iterate in non-decreasing
    last-green-round order (derived from the in-repo CORRECTNESS_r*.json
    union), so stale greens cycle back through the driver's 50-query
    window as code evolves instead of the same early-registry cohort
    being re-verified every round."""
    names = list(entry_mod.queries())
    last = entry_mod._LAST_GREEN_ROUND
    rounds = [last.get(n, 0) for n in names]
    assert rounds == sorted(rounds), "iteration order not least-recently-verified"
    # the union artifact data must actually be loaded (r1..r5 exist)
    assert last, "no CORRECTNESS artifacts parsed"
    assert max(last.values()) >= 5
    # round-agnostic (r6 VERDICT #1): whatever cohort is currently the
    # LEAST-recently-green — derived from the artifact union, never a
    # pinned round literal — must land inside the driver's 50-row window
    # so stale greens actually rotate back through verification
    first50 = set(names[:50])
    oldest_round = min(last.get(n, 0) for n in names)
    oldest_cohort = [n for n in names if last.get(n, 0) == oldest_round]
    for q in oldest_cohort[:50]:
        assert q in first50, f"{q} (last green r{oldest_round}) rotated out"
