"""Persisted per-doc language-ID prediction store (r7 verdict #6).

The dedup families each keep a persisted store so a new ingest batch pays
batch-sized work (gram / band / chunk / embedding / segment stores —
operators/dedup.py). Language-ID now has the same shape: per-doc
predictions computed once are PERSISTED (bucketed parquet keyed on the doc
id — never driver-side state, which would be corpus-sized at 100 TB), and
each ingest scores only its batch against the cached stored-corpus model
(queries/llm_text.py::lang_id_incremental), then folds the batch's rows in
with :func:`prediction_store_merge`.

Store layout at scale: write with ``df.write.bucketBy(B, id_col)
.sortBy(id_col).saveAsTable(...)`` so (a) the merge's anti-join co-locates
without a shuffle on the store side and (b) point lookups prune to one
bucket. The operators below are layout-agnostic DataFrame transforms — the
same code runs over a bucketed table, a plain parquet dir, or a TxnTable
read; tests/test_langid_incremental.py certifies the bucketed path
end-to-end (merge plan has no Exchange on the store side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def prediction_store_merge(
    store: DataFrame, new_preds: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Upsert ``new_preds`` into the prediction store: a batch row REPLACES
    any store row with the same id (re-ingesting a corrected doc re-scores
    it; the store keeps exactly one prediction per doc). Anti-join + union
    — the Delta-style merge shape; on a store bucketed by ``id_col`` the
    anti-join's store side reads pre-partitioned, so the per-ingest cost
    is batch-sized + one store-bucket-local pass, never a corpus shuffle."""
    cols = store.columns
    if set(cols) != set(new_preds.columns):
        raise ValueError(
            f"prediction_store_merge: column mismatch store={sorted(cols)} "
            f"batch={sorted(new_preds.columns)}"
        )
    surviving = store.join(new_preds.select(id_col).distinct(), id_col, "left_anti")
    return surviving.select(*cols).unionByName(new_preds.select(*cols))
