"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This mirrors the driver's t2 correctness gate (which runs at sf0.01); keeping
it in-repo means a regression is caught before the round boundary.
"""

from __future__ import annotations

import pytest

from importer_spark.queries import DIAGNOSTICS, ORACLES, QUERIES
from tests.conftest import assert_query_matches


def test_catalog_is_oracle_complete():
    """Every driver-exported query MUST have an oracle — a catalog entry
    without one guarantees an `err` row whenever the driver samples it.
    Non-oracle-checkable operators belong in DIAGNOSTICS (catalog=False)."""
    assert set(QUERIES) == set(ORACLES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    assert_query_matches(spark, name)


@pytest.mark.parametrize("name", sorted(DIAGNOSTICS))
def test_diagnostics_rows_only(spark, name):
    """Diagnostics queries must at least run and return a stable schema
    (their value-level guarantees live in dedicated error-bound/recall
    tests: test_quantized_ann.py, test_operators.py, test_sources.py)."""
    df = DIAGNOSTICS[name](spark, "/root/testdata/sf0.001")
    assert df.columns
    assert df.count() >= 0
