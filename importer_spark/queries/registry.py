from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a catalog query.

    ``oracle`` is the DuckDB-runnable ANSI SQL equivalent (tables region,
    nation, customer, supplier, part, orders, lineitem, events, documents,
    embeddings are pre-registered views). Column names/aliases MUST match the
    Spark result exactly — the comparison sorts columns by name before
    hashing values.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
