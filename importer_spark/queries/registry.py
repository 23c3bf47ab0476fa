from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# Operators whose output is not oracle-checkable (iterative fixpoints,
# engine-specific sketches, approximate candidate sets): runnable like any
# catalog query but verified in tests/, and NOT exported to the driver —
# the external correctness gate stays oracle-complete by construction.
DIAGNOSTICS: dict[str, QueryFn] = {}


def query(name: str, oracle: str | None = None, catalog: bool = True):
    """Register a catalog query.

    ``oracle`` is the DuckDB-runnable ANSI SQL equivalent (tables region,
    nation, customer, supplier, part, orders, lineitem, events, documents,
    embeddings are pre-registered views). Column names/aliases MUST match the
    Spark result exactly — the comparison sorts columns by name before
    hashing values.

    ``catalog=False`` registers into DIAGNOSTICS instead: for operators whose
    exact output has no SQL-expressible oracle (e.g. k-means assignments, PQ
    ANN whose recall < 1, HLL sketches). These are verified by error-bound /
    determinism / recall tests instead of value-hash parity.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES or name in DIAGNOSTICS:
            raise ValueError(f"duplicate query name {name!r}")
        if not catalog:
            if oracle is not None:
                raise ValueError(f"{name!r}: diagnostics queries have no oracle")
            DIAGNOSTICS[name] = fn
            return fn
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
