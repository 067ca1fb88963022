"""DuckDB-version canary: asserts every cross-engine numeric invariant
the oracles rely on (see oracle_harness.duckdb_invariants). A driver
DuckDB bump that flips one of these is diagnosed here in minutes —
the r5 verdict's prescription after three rounds of ulp forensics."""

import duckdb

from tests.oracle_harness import duckdb_invariants


def test_duckdb_invariants_hold():
    failures = [
        f"{name}: {detail}"
        for name, holds, detail in duckdb_invariants()
        if not holds
    ]
    assert not failures, (
        f"DuckDB {duckdb.__version__} broke oracle invariants:\n"
        + "\n".join(failures)
    )
