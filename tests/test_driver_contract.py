"""Driver-contract invariants (no Spark session needed): the correctness
harness checks at most the first 50 registry entries in dict order, so a
careless reorder or a missing oracle silently removes operator evidence —
pin the contract here."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

import bench


def test_first_fifty_queries_all_have_oracles():
    qs = list(entrymod.queries())
    sqls = entrymod.oracle_sql()
    missing = [q for q in qs[:50] if q not in sqls]
    assert not missing, (
        "every head-of-registry query must be value-hash checkable: "
        f"{missing}"
    )


def test_oracle_keys_subset_of_registry():
    qs = set(entrymod.queries())
    stray = [k for k in entrymod.oracle_sql() if k not in qs]
    assert not stray, f"oracle entries without a query: {stray}"


def test_bench_headline_subset_of_registry():
    qs = set(entrymod.queries())
    missing = [q for q in bench.HEADLINE if q not in qs]
    assert not missing, f"bench names not in the registry: {missing}"


def test_registry_callables_unique():
    fns = list(entrymod.queries().values())
    assert len(set(fns)) == len(fns), "duplicate callable registered twice"


def test_fixture_oracle_paths_exist():
    """Every fixture-parquet path referenced by an oracle must exist —
    the driver runs DuckDB from an arbitrary cwd, so paths are absolute
    and must be committed."""
    import os
    import re

    for name, sql in entrymod.oracle_sql().items():
        for path in re.findall(r"read_parquet\('([^']+)'\)", sql):
            assert os.path.exists(path), (name, path)
