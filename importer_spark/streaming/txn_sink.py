"""Exactly-once streaming sink into the transaction-log table (txn.py).

Structured Streaming's foreachBatch gives at-least-once batch delivery: after
a crash between "sink write" and "checkpoint commit", the SAME (batchId,
rows) is replayed. Exactly-once therefore needs an idempotent sink — the
txn log provides it for free by recording the source's batchId in each
commit manifest: a replayed batch sees its batchId already in the log and
skips, so rows land exactly once no matter how many times the epoch retries.
(This is the published Delta streaming-sink design: txn appId/version in the
commit log.)

At 100 TB the properties compose: commit cost is O(files in the batch), a
skipped replay costs one log scan, and readers only ever see whole batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from importer_spark.txn import TxnTable


def committed_batch_ids(table: TxnTable, query_id: str) -> set[int]:
    latest = table.latest_version()
    if latest is None:
        return set()
    out = set()
    for v in table._versions():
        m = table._manifest(v)
        txn = m.get("txn")
        if txn and txn.get("query_id") == query_id:
            out.add(int(txn["batch_id"]))
    return out


def exactly_once_merge(
    table: TxnTable,
    query_id: str,
    keys: list[str],
    version_col: str | None = None,
    delete_col: str | None = None,
):
    """foreachBatch callback factory: applies each micro-batch as a CDC
    changelog merge (version-guarded upserts + tombstones — see
    TxnTable.commit_merge) exactly once per (query_id, batchId). The
    batchId guard makes replays version-free no-ops, so a crash between
    sink write and checkpoint commit cannot double-apply or bloat the log."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(table, query_id):
            return
        table.commit_merge(
            batch_df,
            keys=keys,
            version_col=version_col,
            delete_col=delete_col,
            txn={"query_id": query_id, "batch_id": int(batch_id)},
        )

    return write


def exactly_once_append(table: TxnTable, query_id: str):
    """foreachBatch callback factory: appends each micro-batch to ``table``
    exactly once, keyed by (query_id, batchId). Use:

        stream.writeStream.foreachBatch(exactly_once_append(t, "events-load"))
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(table, query_id):
            return  # replayed epoch — rows are already durable
        table.commit_append(
            batch_df, txn={"query_id": query_id, "batch_id": int(batch_id)}
        )

    return write
