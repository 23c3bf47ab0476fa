"""Capped-probe RECALL on Zipf-duplicated data (r7 verdict #4): measure
recall vs cap for the two capped dedup probes, on a corpus whose
duplication follows the realistic Zipf law (tools/make_zipf_dup_data.py),
and pin the curve in RECALL_CURVE.json (table mirrored in DEPLOY.md).

Truth is the UNCAPPED operator's own answer on the same data — the caps
are deliberate top-K subsets, so recall here means "fraction of the true
pair set a capped production run still emits":

  * cosine probe: batch = vec_id % 5 == 0 probed against the corpus at
    threshold 0.45 (the embedding_near_dups_incremental geometry), capped
    via max_pairs_per_probe ∈ {4, 8, 16, 64};
  * simhash: banded pairs at Hamming ≤ 3 (`_simhash_pairs`), capped via
    bucket_cap ∈ {4, 8, 16, 64} (buckets larger than the cap route to the
    overflow relation instead of the self-join).

Also recorded per cap: how many probes/buckets saturated (the observable
production watches to decide the cap is too low) and the emitted-pair
count vs truth. PAIR recall is the honest-but-harsh metric on clustered
data — inside a k-clone cluster the dedup DECISION (is this doc a dup of
anything?) needs only one surviving pair per doc, so the artifact also
records doc-level "flagged recall": the fraction of truth-pair-covered
batch docs that still appear in ≥1 capped pair.

Usage: python tools/recall_curve.py [zipf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = [4, 8, 16, 64]


def main() -> None:
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zipfdup"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "RECALL_CURVE.json"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from pyspark.sql import functions as F

    from importer_spark.cert import cert_stamp
    from importer_spark.operators.similarity import as_double_array, cosine_pairs_probe
    from importer_spark.queries.llm_text import _simhash_pairs
    from importer_spark.session import get_spark

    spark = get_spark(
        app_name="recall-curve",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "16")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(f"{data_dir}/embeddings.parquet").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    batch = e.filter(F.col("vec_id") % 5 == 0)

    def pair_stats(truth, capped):
        """(n_truth, n_capped, pair_recall, flagged_recall) — capped must
        be a subset of truth (asserted), so counts suffice for pair
        recall; flagged recall compares per-doc coverage."""
        t = truth.select("id_a", "id_b").persist()
        c = capped.select("id_a", "id_b").persist()
        n_t, n_c = t.count(), c.count()
        extra = c.join(t, ["id_a", "id_b"], "left_anti").count()
        assert extra == 0, f"capped emitted {extra} pairs outside truth"
        docs = lambda df: df.select(  # noqa: E731
            F.explode(F.array("id_a", "id_b")).alias("d")
        ).distinct()
        d_t, d_c = docs(t).count(), docs(t).join(docs(c), "d", "semi").count()
        t.unpersist(), c.unpersist()
        return {
            "truth_pairs": n_t,
            "capped_pairs": n_c,
            "pair_recall": round(n_c / n_t, 4) if n_t else 1.0,
            "flagged_docs_truth": d_t,
            "flagged_recall": round(d_c / d_t, 4) if d_t else 1.0,
        }

    result: dict = {"cert": cert_stamp(), "data_dir": data_dir}
    with open(f"{data_dir}/_clusters.json") as fh:
        result["corpus"] = json.load(fh)

    truth_cos = cosine_pairs_probe(batch, e, "vec_id", "emb", threshold=0.45)
    cos_curve = {}
    for cap in CAPS:
        pairs, overflow = cosine_pairs_probe(
            batch, e, "vec_id", "emb", threshold=0.45,
            max_pairs_per_probe=cap, return_overflow=True,
        )
        st = pair_stats(truth_cos, pairs)
        st["saturated_probes"] = overflow.count()
        cos_curve[str(cap)] = st
        print("cosine", cap, json.dumps(st), flush=True)
    result["cosine_pairs_probe"] = cos_curve

    truth_sh, _ = _simhash_pairs(spark, data_dir, bucket_cap=None)
    sh_curve = {}
    for cap in CAPS:
        pairs, overflow = _simhash_pairs(spark, data_dir, bucket_cap=cap)
        st = pair_stats(truth_sh, pairs)
        st["overflow_buckets"] = overflow.count()
        sh_curve[str(cap)] = st
        print("simhash", cap, json.dumps(st), flush=True)
    result["simhash_bucket_capped"] = sh_curve

    # r9: the sorted-neighborhood recovery pass over the routed-out
    # buckets (dedup.snm_chain_pairs, window 8 — the production default
    # simhash_bucket_capped ships with). Same truth, same caps: the delta
    # vs the curve above is what SNM buys back at O(bucket×window).
    snm_curve = {}
    for cap in CAPS:
        pairs, _ = _simhash_pairs(spark, data_dir, bucket_cap=cap, snm_window=8)
        st = pair_stats(truth_sh, pairs)
        snm_curve[str(cap)] = st
        print("simhash+snm8", cap, json.dumps(st), flush=True)
    result["simhash_snm_recovered"] = snm_curve

    # r10 (r9 verdict #2): cluster-LEVEL effect of capped recovery on the
    # keep-best survivor pick. Pair recall under cap+SNM is sparse (0.07
    # at cap 64) while doc-flag recall is 0.988 — if the recovered pair
    # graph FRAGMENTS a clone cluster, keep-best keeps one survivor PER
    # FRAGMENT: silent over-retention of duplicates, the exact failure
    # mode this curve machinery exists to expose. Measured directly:
    # the removed-doc sets of the keep-best policy (quality desc, doc_id
    # tiebreak — queries/llm_refine.dedup_keep_best) under uncapped vs
    # capped+SNM pairs. Capped pairs ⊆ uncapped pairs ⇒ capped components
    # REFINE uncapped components ⇒ an uncapped survivor is still the best
    # of whichever fragment contains it, so removed_capped ⊆
    # removed_uncapped (asserted) and over-retention is exactly the
    # set difference.
    from pyspark.sql import Window

    from importer_spark.operators.graph import connected_components
    from importer_spark.queries.llm_text import doc_quality_scores

    quality = doc_quality_scores(spark, data_dir).select("doc_id", "quality_score")

    def removed_docs(pairs):
        labels = connected_components(pairs, out_id="doc_id")
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("quality_score").desc(), F.col("doc_id")
        )
        return (
            labels.join(quality, "doc_id")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > 1)
            .select("doc_id")
        )

    removed_u = removed_docs(truth_sh).persist()
    n_removed_u = removed_u.count()
    kb_curve = {}
    for cap in CAPS:
        pairs, _ = _simhash_pairs(spark, data_dir, bucket_cap=cap, snm_window=8)
        removed_c = removed_docs(pairs).persist()
        n_removed_c = removed_c.count()
        extra = removed_c.join(removed_u, "doc_id", "left_anti").count()
        assert extra == 0, (
            f"cap {cap}: capped keep-best removed {extra} docs the uncapped "
            "policy retained — refinement invariant broken"
        )
        over = n_removed_u - n_removed_c
        kb_curve[str(cap)] = {
            "dups_removed_uncapped": n_removed_u,
            "dups_removed_capped_snm": n_removed_c,
            "over_retained_docs": over,
            "dup_removal_retention": (
                round(n_removed_c / n_removed_u, 4) if n_removed_u else 1.0
            ),
        }
        removed_c.unpersist()
        print("keep_best", cap, json.dumps(kb_curve[str(cap)]), flush=True)
    removed_u.unpersist()
    result["keep_best_retention"] = kb_curve

    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(json.dumps({"out": out_path}))


if __name__ == "__main__":
    main()
