"""GraphQL cursor-paginated source (SURVEY §2.1 S7 — the reference's second
transport: pipelines/shopify/shopify_dlt/__init__.py:168-228 runs a GraphQL
query, extracts data items and a pagination cursor by JSONPath, and re-runs
the query with the cursor piped into a variable until a page yields no items
or no cursor; helpers.py:127-146 is the loop).

Spark shape mirrors RestCursorSource: the transport is injected (a real HTTP
client in production, a fake in tests), pages accumulate on the driver —
bounded because the cursor advances every page — and land as one DataFrame
with a ``_cursor`` audit column for the state table. The JSONPath subset
implemented here (dotted fields, ``[*]``, integer / ``[-1]`` indexes) covers
the reference's documented usage without any dependency.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Transport = Callable[[str, dict], dict]
"""(query, variables) -> decoded GraphQL response (the ``data`` envelope)."""

_TOKEN = re.compile(r"([A-Za-z0-9_-]+)|\[(\*|-?\d+)\]")
# segment = field with optional index suffixes, or bare indexes; segments
# joined by dots. Anything else ($ root, * wildcards, .. descent, [filters])
# is outside this subset and must raise, not misparse as a field lookup.
_SEGMENT = r"(?:[A-Za-z0-9_-]+|\[(?:\*|-?\d+)\])(?:\[(?:\*|-?\d+)\])*"
_PATH_GRAMMAR = re.compile(rf"{_SEGMENT}(?:\.{_SEGMENT})*")


def extract_path(obj, path: str) -> list:
    """Resolve a JSONPath-lite expression against nested dict/list data.

    Supports ``a.b.c`` field access, ``[*]`` fan-out over a list, and
    ``[N]`` / ``[-1]`` indexing. Returns ALL matched values (empty list when
    the path dead-ends) — the find_values contract the reference's
    pagination loop relies on. Raises ``ValueError`` on syntax outside the
    subset (``$`` roots, ``*``/``..`` wildcards, ``[foo]`` filters) instead
    of silently misparsing it as a field access."""
    if not _PATH_GRAMMAR.fullmatch(path):
        raise ValueError(f"unsupported JSONPath syntax in {path!r}")
    values = [obj]
    for m in _TOKEN.finditer(path):
        field, index = m.group(1), m.group(2)
        nxt: list = []
        for v in values:
            if field is not None:
                if isinstance(v, dict) and field in v:
                    nxt.append(v[field])
            elif index == "*":
                if isinstance(v, list):
                    nxt.extend(v)
            else:
                if isinstance(v, list):
                    i = int(index)
                    if -len(v) <= i < len(v):
                        nxt.append(v[i])
        values = nxt
        if not values:
            break
    return values


class GraphQLCursorSource:
    def __init__(
        self,
        spark: SparkSession,
        execute: Transport,
        query: str,
        data_items_path: str,
        pagination_cursor_path: str,
        pagination_variable_name: str = "after",
        variables: dict | None = None,
    ):
        self.spark = spark
        self.execute = execute
        self.query = query
        self.data_items_path = data_items_path
        self.pagination_cursor_path = pagination_cursor_path
        self.pagination_variable_name = pagination_variable_name
        self.variables = dict(variables or {})

    def _pages(self):
        variables = dict(self.variables)
        prev_cursor = variables.get(self.pagination_variable_name)
        prev_items = None
        while True:
            data = self.execute(self.query, dict(variables))
            items = extract_path(data, self.data_items_path)
            if not items:
                return
            cursors = extract_path(data, self.pagination_cursor_path)
            cursor = cursors[-1] if cursors else None
            if cursor is not None and cursor == prev_cursor:
                # The cursor did not advance. A re-served identical page is
                # skipped (no double ingest); NEW items under a stuck cursor
                # mean the feed cannot be paginated safely — refuse loudly
                # rather than loop forever or silently drop data.
                if items == prev_items:
                    return
                raise RuntimeError(
                    "GraphQLCursorSource: cursor "
                    f"{cursor!r} did not advance but the page contents "
                    "changed — the feed is not safely paginatable with "
                    f"variable {self.pagination_variable_name!r}"
                )
            yield items, cursor
            if cursor is None:
                return  # no cursor → last page (reference breaks here too)
            prev_cursor = cursor
            prev_items = items
            variables[self.pagination_variable_name] = cursor

    def load(self, empty_schema: str | None = None) -> DataFrame:
        """Fetch every page into one DataFrame; ``_cursor`` carries the last
        pagination cursor seen (callers persist it via the same state-table
        pattern as the REST source). ``empty_schema``: DDL schema when zero
        records arrive (nothing to infer from)."""
        records: list[dict] = []
        last_cursor: str | None = None
        for items, cursor in self._pages():
            records.extend(items)
            if cursor is not None:
                last_cursor = cursor
        if not records:
            schema = empty_schema or "_cursor string"
            return self.spark.createDataFrame([], schema=schema)
        df = self.spark.createDataFrame(records)
        return df.withColumn("_cursor", F.lit(last_cursor).cast("string"))
