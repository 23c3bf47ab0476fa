"""Incremental language-ID (r7 verdict #6): oracle parity, batch-slice
semantics, the persisted prediction store, and the batch-cost plan shape.

`lang_id_incremental` is registered as a DIAGNOSTIC — the driver catalog
is frozen at 202 (r7 verdict #7) — so its DuckDB oracle is enforced HERE,
every pytest run, with the same canonicalization the driver gate uses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from importer_spark.queries import DIAGNOSTICS
from importer_spark.queries.llm_text import (
    _INCR_SCORE_WHERE,
    _INCR_TRAIN_WHERE,
    _LANG_NB_INCR_SQL,
    _lang_nb_model,
    _lang_nb_pred,
)
from tests.conftest import SF_DIR, canonical, duck_con


def test_oracle_parity_sf0001(spark):
    """The diagnostic twin is oracle-green: value-hash parity against the
    train-on-store / score-the-batch DuckDB re-derivation."""
    sdf = DIAGNOSTICS["lang_id_incremental"](spark, SF_DIR).toPandas()
    odf = duck_con(SF_DIR).execute(_LANG_NB_INCR_SQL).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf) > 0
    a, b = canonical(sdf), canonical(odf)
    assert a.equals(b), (
        f"value mismatch; first rows\n{a[(a != b).any(axis=1)].head(3)}\nvs\n"
        f"{b[(a != b).any(axis=1)].head(3)}"
    )


def test_scores_exactly_the_batch_docs(spark):
    """Output ids == the labeled batch docs (doc_id % 5 == 0), and every
    predicted class comes from the STORED corpus's label set (a class the
    model never saw cannot be predicted)."""
    out = DIAGNOSTICS["lang_id_incremental"](spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = {
        r["doc_id"]
        for r in docs.filter(
            F.col("lang").isNotNull()
            & F.col("text").isNotNull()
            & (F.length("text") >= 1)
            & F.expr(_INCR_SCORE_WHERE)
        )
        .select("doc_id")
        .collect()
    }
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == expected
    train_classes = {
        r["lang"]
        for r in docs.filter(
            F.col("lang").isNotNull() & F.expr(_INCR_TRAIN_WHERE)
        ).select("lang").distinct().collect()
    }
    assert {r["predicted_lang"] for r in rows} <= train_classes


def test_model_caches_separately_from_full_model(spark):
    """The subset model must not serve (or be served by) the full-corpus
    model: distinct cache keys, one build each, and repeated incremental
    calls reuse the cached subset model."""
    from importer_spark.queries import llm_text as lt

    before = lt._NB_MODEL_BUILDS
    m_incr = _lang_nb_model(spark, SF_DIR, train_where=_INCR_TRAIN_WHERE)
    m_incr2 = _lang_nb_model(spark, SF_DIR, train_where=_INCR_TRAIN_WHERE)
    m_full = _lang_nb_model(spark, SF_DIR)
    assert m_incr is m_incr2, "second incremental call must hit the cache"
    assert m_incr is not m_full, "subset model must not alias the full model"
    assert lt._NB_MODEL_BUILDS - before <= 2  # at most one build per key
    # The subset model really is trained on less data.
    assert m_incr["ndt"] < m_full["ndt"]


def test_prediction_store_merge_upserts(spark):
    """Store semantics: one row per doc after merge; batch rows replace
    store rows with the same id; untouched store rows survive."""
    from importer_spark.operators.langid import prediction_store_merge

    schema = "doc_id bigint, predicted_lang string, nb_logprob double"
    store = spark.createDataFrame(
        [(1, "en", -10.0), (2, "fr", -12.0), (3, "de", -9.0)], schema=schema
    )
    batch = spark.createDataFrame(
        [(3, "en", -8.5), (4, "es", -7.0)], schema=schema
    )
    merged = {r["doc_id"]: r for r in prediction_store_merge(store, batch).collect()}
    assert set(merged) == {1, 2, 3, 4}
    assert merged[3]["predicted_lang"] == "en" and merged[3]["nb_logprob"] == -8.5
    assert merged[1]["predicted_lang"] == "en"
    with pytest.raises(ValueError, match="column mismatch"):
        prediction_store_merge(store, batch.drop("nb_logprob"))


def test_store_union_covers_corpus_and_merge_prunes_on_bucketed_store(spark, tmp_path):
    """End-to-end incremental ingest over a BUCKETED persisted store:
    stored-corpus predictions written once (bucketBy doc_id), the batch
    scored incrementally, merged — the result covers every labeled doc
    exactly once, and the merge's store side carries no Exchange (the
    bucketed layout IS the partitioning; batch-sized cost per ingest)."""
    from importer_spark.operators.langid import prediction_store_merge

    m = _lang_nb_model(spark, SF_DIR, train_where=_INCR_TRAIN_WHERE)
    stored = _lang_nb_pred(
        spark, SF_DIR, model=m, score_where=_INCR_TRAIN_WHERE
    ).select("doc_id", "predicted", "nb_logprob")
    spark.sql("DROP TABLE IF EXISTS langid_pred_store")
    (
        stored.write.bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .mode("overwrite")
        .saveAsTable("langid_pred_store")
    )
    try:
        store = spark.table("langid_pred_store")
        batch = DIAGNOSTICS["lang_id_incremental"](spark, SF_DIR).select(
            "doc_id", F.col("predicted_lang").alias("predicted"), "nb_logprob"
        )
        merged = prediction_store_merge(store, batch)
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n_labeled = docs.filter(
            F.col("lang").isNotNull()
            & F.col("text").isNotNull()
            & (F.length("text") >= 1)
        ).count()
        rows = merged.collect()
        assert len(rows) == n_labeled
        assert len({r["doc_id"] for r in rows}) == n_labeled
        # Plan shape: under the sort-merge path (broadcast disabled — a
        # broadcast anti-join never shuffles the store side anyway, so it
        # would prove nothing) the STORE side must feed the join straight
        # from the bucketed scan: exactly ONE Exchange in the whole plan
        # (the batch side), and the store scan reads Bucketed.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            ids = spark.range(0, 1000, 5).select(F.col("id").alias("doc_id"))
            anti = store.join(ids, "doc_id", "left_anti")
            plan = anti._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, plan
            scan_seg = [
                seg for seg in plan.split("Scan") if "langid_pred_store" in seg
            ]
            assert scan_seg and "Bucketed: true" in scan_seg[0], plan
            assert plan.count("Exchange") == 1, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS langid_pred_store")
