"""Model-DAG mechanics and physical-plan audits.

The plan audits assert the optimizer behaviors the 100 TB design depends on:
filters reaching the parquet scan, dims broadcasting, codegen in the hot
path. They check stable substrings of explain output — loose enough to
survive Spark version churn, tight enough to catch a regression to
shuffle-everything plans.
"""

from __future__ import annotations

import pytest

from importer_spark.plans.dag import ModelGraph
from importer_spark.queries import QUERIES
from tests.conftest import SF_DIR


def _explain(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_dag_topological_order_and_cache(spark):
    g = ModelGraph()
    calls = []

    @g.model("a")
    def a(ctx):
        calls.append("a")
        return ctx.spark.range(3)

    @g.model("b", deps=["a"])
    def b(ctx):
        calls.append("b")
        return ctx.ref("a").withColumnRenamed("id", "b_id")

    @g.model("c", deps=["a", "b"])
    def c(ctx):
        calls.append("c")
        return ctx.ref("b")

    out = g.run(spark, SF_DIR, targets=["c"])
    assert calls == ["a", "b", "c"]
    # 'a' has two dependents → cached.
    assert out["a"].is_cached
    assert not out["c"].is_cached
    g.release(out)
    assert not out["a"].is_cached


def test_dag_cycle_detection(spark):
    g = ModelGraph()

    @g.model("x", deps=["y"])
    def x(ctx):
        return ctx.ref("y")

    @g.model("y", deps=["x"])
    def y(ctx):
        return ctx.ref("x")

    with pytest.raises(ValueError, match="cycle"):
        g.run(spark, SF_DIR, targets=["x"])


def test_dag_unknown_model(spark):
    g = ModelGraph()
    with pytest.raises(KeyError):
        g.run(spark, SF_DIR, targets=["nope"])


def test_filter_pushdown_reaches_scan(spark):
    plan = _explain(spark, "pricing_summary")
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200], plan


def test_column_pruning_on_scan(spark):
    plan = _explain(spark, "pricing_summary")
    # The lineitem scan must not read columns the query never touches.
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema


def test_dims_broadcast_in_star_join(spark):
    plan = _explain(spark, "region_revenue")
    assert "BroadcastHashJoin" in plan


def test_hot_path_is_codegen(spark):
    df = QUERIES["orders_fact"](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    )
    # "Found N WholeStageCodegen subtrees" — the agg+join hot path compiles.
    assert "WholeStageCodegen" in plan


def test_asof_join_single_shuffle(spark):
    """The as-of operator must shuffle once on the key — a join-based
    implementation would show 2+ exchanges plus a join node."""
    plan = _explain(spark, "asof_last_view")
    assert plan.count("Exchange") <= 2, plan  # initial + AQE read
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_topk_uses_take_ordered(spark):
    plan = _explain(spark, "top_customers")
    assert "TakeOrderedAndProject" in plan


def test_anti_join_prunes_build_side(spark):
    """NOT EXISTS must compile to a LeftAnti join whose orders-side scan
    reads ONLY the join key — at 100 TB the build side is a key column,
    not the orders table."""
    plan = _explain(spark, "customers_without_orders")
    assert "LeftAnti" in plan, plan
    orders_schema = [
        seg[:200] for seg in plan.split("ReadSchema: ") if "o_custkey" in seg[:200]
    ]
    assert orders_schema and all("o_totalprice" not in s for s in orders_schema), plan


def test_semi_join_pushes_fact_filter(spark):
    """EXISTS with a predicate: the returnflag filter must reach the
    lineitem parquet scan (build side shrinks before the join)."""
    plan = _explain(spark, "parts_with_returns")
    assert "LeftSemi" in plan, plan
    assert "l_returnflag" in plan.split("PushedFilters")[1][:300], plan


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        # Static count — consumers repeat the candidate subtree in the text
        # plan (dedup.py explains why caching it is a measured loss); 44
        # before the explode-based cand_ids, 28 after. Pins the improvement.
        ("near_dup_pairs", 30),
        ("tfidf_weights", 4),        # tf agg + df agg + broadcast join
        ("benchmark_contamination", 6),
        ("mart_product_period_spending", 4),
        ("revenue_share", 3),
        ("dq_orders_suite", 2),      # single-scan agg
        # +2 over the naive one-window packing: the distributed prefix-sum
        # buys a per-bucket agg and an offsets join so no language stream
        # ever serializes through a single task — the right trade at scale.
        ("dq_curation_suite", 7),
        ("sequence_packing", 4),
        ("simhash_near_dups", 4),    # two simhash aggs feed the band join
        ("embedding_near_dups", 2),  # one blk-pair shuffle; pairs broadcast
        # Round-3 plans: the interval join is ONE fact shuffle (promos
        # broadcast after the bin explode); chunking is pure narrow ops;
        # heavy hitters = sketch scan + candidate distinct + recount agg
        # (the only nested loop is the 1-row total broadcast); quantized ANN
        # keeps the corpus unshuffled like the other probe-broadcast ANNs.
        ("promo_period_revenue", 2),
        # Composed bloom+interval mart: bloom probe dies in the scan, promos
        # broadcast → the single exchange is the final agg.
        ("bloom_promo_attribution", 2),
        # Real-codec multimodal: synthesis + decode are partition-local.
        ("audio_wav_features", 0),
        ("image_ppm_features", 0),
        # counts agg + weight-sum + quota broadcast + per-domain window.
        ("domain_mixture_sample", 4),
        # As-of = ONE key shuffle (union-and-fill, no join operator).
        ("asof_next_purchase", 2),
        # Distinct-count rewrite: explicit user_id repartition serves BOTH
        # stacked windows (coarser hash satisfies the finer clustering).
        ("cumulative_distinct_types", 1),
        # Funnel: 3 stacked conditional-min windows, same user partitioning.
        ("user_funnel_stages", 2),
        ("doc_chunks", 0),
        ("frequent_tokens", 4),
        ("embedding_quantized_topk", 2),
    ],
)
def test_shuffle_budget(spark, name, max_exchanges):
    """Pin the shuffle count of the heaviest/most-optimized plans: a
    regression that re-introduces an extra Exchange (e.g. losing a
    broadcast, re-deriving a branch) fails here before it costs minutes at
    scale. Counts are generous ceilings, not exact — AQE may merge or add
    reads."""
    import re

    plan = _explain(spark, name)
    n = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n <= max_exchanges, f"{name}: {n} exchanges > budget {max_exchanges}\n{plan}"


def test_plan_snapshot_no_regressions(spark):
    """Whole-catalog plan regression gate: every query's Exchange /
    BroadcastExchange / nested-loop counts are pinned in
    tests/plan_snapshot.json. A lost broadcast or an extra shuffle anywhere
    in the catalog fails here with the query name — regenerate the snapshot
    (script in the file header of plan_snapshot.json's git log) only when a
    plan change is intentional and reviewed. New queries missing from the
    snapshot fail too, so the gate can't silently thin out."""
    import json
    import os
    import re

    from importer_spark.queries import DIAGNOSTICS

    with open(os.path.join(os.path.dirname(__file__), "plan_snapshot.json")) as fh:
        baseline = json.load(fh)
    catalog = {**QUERIES, **DIAGNOSTICS}
    missing = sorted(set(catalog) - set(baseline))
    assert not missing, f"queries missing from plan_snapshot.json: {missing}"
    bad = {}
    for name, fn in sorted(catalog.items()):
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        got = {
            "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
            "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
            "nested_loops": len(re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", plan)),
        }
        want = baseline[name]
        # Regressions only: MORE exchanges/nested-loops or FEWER broadcasts.
        if (
            got["exchanges"] > want["exchanges"]
            or got["nested_loops"] > want["nested_loops"]
            or got["broadcasts"] < want["broadcasts"]
        ):
            bad[name] = {"want": want, "got": got}
    assert not bad, f"plan regressions: {json.dumps(bad, indent=1)}"


def test_no_complex_output_columns(spark):
    """Every registered query must emit only scalar top-level columns: the
    driver's order-insensitive canonicalizer sorts raw cells with pandas,
    which dies on unhashable array/struct/map values (round-1 lesson:
    approx_distinct_sketch's array<double> quantiles column). Arrays are
    fine INSIDE a query; flatten (element_at / to_json) before returning."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from importer_spark.queries import DIAGNOSTICS

    offenders = {}
    for name, fn in sorted({**QUERIES, **DIAGNOSTICS}.items()):
        df = fn(spark, SF_DIR)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            offenders[name] = complex_cols
    assert not offenders, offenders


def test_range_attribution_heavy_window_is_day_bounded(spark):
    """r9 hierarchical prefix sums: the window that scans the fact-sized
    timeline must partition by (key, DAY) — never by key alone, which is
    one task per key and arbitrarily long on a hot key (r8 skew axis).
    The per-key-only window is allowed ONLY at level 2, whose input is
    day-partials + probes (leads+days-sized). Pins both: the _w_cnt
    running sum partitions on (user_id, _seg, ...ts order), and the only
    key-alone windowspec is the level-2 _w2_cnt carry."""
    import re

    df = QUERIES["signup_attribution"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lvl1 = re.findall(r"sum\(_w_cnt#\d+\) windowspecdefinition\(([^)]*)\)", plan)
    assert lvl1, "level-1 running sum missing from the plan"
    for spec in lvl1:
        assert re.match(r"user_id#\d+L?, _seg#\d+, _ts#\d+", spec), spec
    lvl2 = re.findall(r"sum\(_w2_cnt#\d+L?\) windowspecdefinition\(([^)]*)\)", plan)
    assert lvl2, "level-2 carry sum missing from the plan"
    for spec in lvl2:
        assert re.match(r"user_id#\d+L?, _seg#\d+ ASC NULLS FIRST", spec), spec
