"""Declarative per-mart quality manifest gate: every mart-shaped catalog
query's structural invariants (the dbt-yml-layer analog) hold at sf0.001,
evaluated one single-scan suite per query."""

from __future__ import annotations

import pytest

from importer_spark.quality import QualityError
from importer_spark.quality_manifest import MANIFEST, assert_manifest, run_manifest

SF = "/root/testdata/sf0.001"


def test_manifest_breadth():
    """The manifest blankets the mart layer: ≥20 queries, ≥150 checks,
    every kind represented (parity with the reference's yml coverage mix)."""
    assert len(MANIFEST) >= 20
    checks = [c for suite in MANIFEST.values() for c in suite]
    assert len(checks) >= 150
    kinds = {c["kind"] for c in checks}
    assert kinds >= {"not_null", "unique", "accepted_values", "accepted_range", "expression"}


def test_manifest_targets_are_registered_queries():
    from importer_spark.queries import QUERIES

    missing = sorted(set(MANIFEST) - set(QUERIES))
    assert not missing, f"manifest names not in catalog: {missing}"


def test_all_manifests_green(spark):
    summary = assert_manifest(spark, SF)
    assert summary["queries"] == len(MANIFEST)
    assert summary["checks"] >= 150


def test_manifest_failure_surfaces(spark):
    """A deliberately-wrong invariant fails loudly with the (query, check)
    pair — the gate can't silently pass on a broken mart."""
    import importer_spark.quality_manifest as qm

    bad = {"top_customers": [
        {"kind": "expression", "expr": "n_orders >= 10000000", "name": "impossible"}
    ]}
    orig = qm.MANIFEST
    qm.MANIFEST = bad
    try:
        with pytest.raises(QualityError, match="impossible"):
            assert_manifest(spark, SF)
    finally:
        qm.MANIFEST = orig


def test_run_manifest_shape(spark):
    res = run_manifest(spark, SF, names=["pricing_summary"])
    assert res.columns == ["query_name", "check_name", "n_violations", "passed"]
    rows = res.collect()
    assert all(r.query_name == "pricing_summary" for r in rows)
    assert len(rows) == len(MANIFEST["pricing_summary"])
