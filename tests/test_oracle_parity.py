"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This mirrors the driver's t2 correctness gate (which runs at sf0.01); keeping
it in-repo means a regression is caught before the round boundary.
"""

from __future__ import annotations

import pytest

from importer_spark.queries import ORACLES, QUERIES
from tests.conftest import assert_query_matches


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    assert_query_matches(spark, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, name):
    """Queries without an oracle must at least run and return a stable schema."""
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    assert df.columns
    assert df.count() >= 0
