"""Oracle hygiene — fast checks that need no SparkSession.

The correctness gate runs every oracle against DuckDB; these tests catch
oracle bitrot (SQL syntax errors, renamed tables, bad registry entries) in
seconds instead of a multi-minute Spark sweep.
"""

from __future__ import annotations

import duckdb
import pytest

from __spark_entry__ import oracle_sql, queries
from graph_db_spark.plans.queries import _EXPENSIVE_LAST
from graph_db_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_oracle_parses_and_binds(con):
    """EXPLAIN every oracle: parse + bind against the real fixture schemas
    (catches column renames and SQL typos without executing)."""
    bad = []
    for name, sql in oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — collecting all failures
            bad.append(f"{name}: {e}")
    assert not bad, "\n".join(bad)


def test_oracle_keys_subset_of_queries():
    q, o = queries(), oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)
    # rows-only set stays intentional: after the portable-hash MinHash/
    # SimHash conversion, only the Datasketches-impl-specific HLL estimate
    # lacks an exact oracle (it carries hll_error_bound instead)
    rows_only = set(q) - set(o)
    assert rows_only == {"hll_user_reach"}, rows_only


def test_gate_window_and_expensive_tail_ordering():
    """Registration order = the driver's contract: the first 50 names are
    exactly _GATE_WINDOW (the round-4 rotation giving driver-visible
    correctness rows to the families rounds 1-3 never surfaced), and the
    expensive iterative queries not promoted into the window close the
    tail in their cost order."""
    from graph_db_spark.plans.queries import _GATE_WINDOW

    q = list(queries())
    assert len(_GATE_WINDOW) == 50
    assert q[:50] == _GATE_WINDOW
    assert set(_EXPENSIVE_LAST) <= set(q), set(_EXPENSIVE_LAST) - set(q)
    tail = [n for n in _EXPENSIVE_LAST if n not in set(_GATE_WINDOW)]
    assert q[-len(tail):] == tail
