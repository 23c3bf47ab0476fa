"""Certify the doc-similarity family at sf1 where the DuckDB oracle cannot
follow (LOCAL_GATE_sf1.json records oracle_timeouts for these: the
single-threaded SQL re-derivation of MinHash+LSH+exact-Jaccard is ~100x the
engine's cost at 50k docs).

The scaled dataset's construction makes an exact certification possible
anyway. /tmp/sf1 documents are 10 content-perturbed copies of sf0.1
(tools/make_scaled_data.py): copy 0 is byte-identical to the source, and
copies never share shingles (per-copy token suffixing), so

  1. no cross-copy candidate pair or cluster edge can exist, and
  2. every hash computed over copy-0 content (shingles, MinHash
     signatures, LSH band keys) is identical to the sf0.1 run,

therefore the sf1 result restricted to copy-0 ids (< STRIDE) must equal
the sf0.1 result EXACTLY — and the sf0.1 result is itself checked here
against the DuckDB oracle (feasible at 5k docs). The chain is
DuckDB(sf0.1) == Spark(sf0.1) == Spark(sf1)|copy0, value-level.

Copies 1-9 are bijective token renamings, so exact-similarity semantics
(Jaccard values, cluster structure) replicate per copy; their hash-seeded
LSH candidate sets may legitimately differ on borderline pairs (recall<1
is signature-dependent), which is why the per-copy row counts are
reported rather than asserted equal.

Writes SIMILARITY_GATE_sf1.json. Usage:
    python tools/verify_scaled_similarity.py [sf01_dir] [sf1_dir] [out]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 10_000_000  # must match tools/make_scaled_data.py

TARGETS = {
    "near_dup_pairs": ["id_a", "id_b"],
    "near_dup_pairs_incremental": ["id_a", "id_b"],
    "near_dup_clusters": ["doc_id", "cluster_id"],
    "near_dup_clusters_star": ["doc_id", "cluster_id"],
}

# The embedding twins need a DIFFERENT certification shape. Copy i multiplies
# every vector by one ±1 sign vector (make_scaled_data.py) — an exact
# dot-product isometry, so each copy's WITHIN-copy pair set replicates copy 0
# bitwise. But unlike the text side (token suffixing ⇒ provably-disjoint
# shingle spaces ⇒ zero cross-copy pairs), sign flips only decorrelate
# cross-copy cosines in expectation: with effective dimension ~23 the twin
# cosine has σ≈0.21, so at the 0.45 threshold a few percent of the 225k
# cross-copy twin pairs land above it. Those pairs are REAL properties of the
# scaled dataset (the exact oracle reports them too), not engine errors — so
# the gate (a) checks the within-copy restriction of every copy equals the
# sf0.1-certified answer exactly, (b) checks the full sf1 pair set against
# the exact DuckDB oracle run AT sf1, and (c) checks the sf1 clusters against
# a recursive closure computed over that certified sf1 pair set (the full
# cluster oracle — brute-force pairs + closure — times out the main gate;
# factoring it through the certified pairs is the same ground truth at
# tractable cost). Cross-copy pair counts are recorded as data facts.
EMB_PAIRS = "embedding_near_dups"
EMB_CLUSTERS = "embedding_dup_clusters"

_EMB_CLOSURE_SQL = """
WITH RECURSIVE edges AS (
  SELECT id_a AS src, id_b AS dst FROM certified_pairs
  UNION ALL SELECT id_b, id_a FROM certified_pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
),
labels AS (SELECT id AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
SELECT vec_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM labels
"""


def _bruteforce_pairs_cte(extra_pred: str = "") -> str:
    """All-pairs exact-Jaccard reference (O(n²) list intersections — only
    feasible at sf0.01). The REGISTERED oracles use the inverted-index
    formulation (llm_dedup._index_pairs_cte) for index-join cost; this
    brute-force text exists solely to pin, at a scale where both are
    runnable, that the two formulations are semantically identical."""
    from importer_spark.queries.llm_dedup import _SHINGLE_CTE

    return (
        _SHINGLE_CTE
        + f"""
, pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE
          / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8 {extra_pred}
)
"""
    )


def bruteforce_oracle(name: str) -> str:
    if name == "near_dup_pairs":
        return _bruteforce_pairs_cte() + "SELECT id_a, id_b, jaccard FROM pairs"
    if name == "near_dup_pairs_incremental":
        return (
            _bruteforce_pairs_cte("AND (id_a % 5 = 0 OR id_b % 5 = 0)")
            + "SELECT id_a, id_b, jaccard FROM pairs"
        )
    if name in ("near_dup_clusters", "near_dup_clusters_star"):
        return (
            _bruteforce_pairs_cte().replace("WITH d AS", "WITH RECURSIVE d AS")
            + """
, edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
),
labels AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM labels
"""
        )
    raise KeyError(name)


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "SIMILARITY_GATE_sf1.json"

    from importer_spark.queries import ORACLES, QUERIES
    from importer_spark.session import get_spark
    from tests.conftest import canonical, duck_con

    spark = get_spark(
        app_name="similarity-gate",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf01)

    con_small = duck_con("/root/testdata/sf0.01")

    report: dict[str, dict] = {}
    for name, id_cols in TARGETS.items():
        entry: dict = {}
        # Pin the registered (inverted-index) oracle against the all-pairs
        # brute force where brute force is feasible (sf0.01).
        ref = canonical(con_small.execute(bruteforce_oracle(name)).df())
        eff = canonical(con_small.execute(ORACLES[name]).df())
        entry["rewrite_faithful_sf001"] = bool(ref.equals(eff))

        t0 = time.perf_counter()
        base_spark = QUERIES[name](spark, sf01).toPandas()
        entry["sf01_spark_rows"] = len(base_spark)
        entry["sf01_spark_s"] = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        base_oracle = con.execute(ORACLES[name]).df()
        entry["sf01_oracle_rows"] = len(base_oracle)
        entry["sf01_oracle_s"] = round(time.perf_counter() - t0, 1)
        entry["sf01_oracle_match"] = bool(
            len(base_spark) == len(base_oracle)
            and canonical(base_spark).equals(canonical(base_oracle))
        )

        t0 = time.perf_counter()
        big = QUERIES[name](spark, sf1).toPandas()
        entry["sf1_spark_rows"] = len(big)
        entry["sf1_spark_s"] = round(time.perf_counter() - t0, 1)

        copy = big[id_cols[0]] // STRIDE
        entry["rows_per_copy"] = copy.value_counts().sort_index().tolist()
        copy0 = big[(big[id_cols] < STRIDE).all(axis=1)].reset_index(drop=True)
        entry["copy0_rows"] = len(copy0)
        entry["copy0_match"] = bool(
            len(copy0) == len(base_oracle)
            and canonical(copy0).equals(canonical(base_oracle))
        )
        # No pair/cluster may ever straddle copies (disjoint shingle spaces).
        straddle = (big[id_cols].floordiv(STRIDE).nunique(axis=1) > 1).sum()
        entry["cross_copy_rows"] = int(straddle)
        report[name] = entry
        print(name, json.dumps(entry), file=sys.stderr)

    text_ok = all(
        e["rewrite_faithful_sf001"]
        and e["sf01_oracle_match"]
        and e["copy0_match"]
        and e["cross_copy_rows"] == 0
        for e in report.values()
    )

    # --- embedding family (see the module-level rationale) -----------------
    con1 = duck_con(sf1)
    base_pairs = con.execute(ORACLES[EMB_PAIRS]).df()  # sf0.1 exact oracle

    pe: dict = {}
    t0 = time.perf_counter()
    big_pairs = QUERIES[EMB_PAIRS](spark, sf1).toPandas()
    pe["sf1_spark_rows"] = len(big_pairs)
    pe["sf1_spark_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    oracle_pairs = con1.execute(ORACLES[EMB_PAIRS]).df()
    pe["sf1_oracle_rows"] = len(oracle_pairs)
    pe["sf1_oracle_s"] = round(time.perf_counter() - t0, 1)
    pe["sf1_oracle_match"] = bool(
        len(big_pairs) == len(oracle_pairs)
        and canonical(big_pairs).equals(canonical(oracle_pairs))
    )
    ca, cb = big_pairs["id_a"] // STRIDE, big_pairs["id_b"] // STRIDE
    n_copies = int(max(ca.max(), cb.max())) + 1 if len(big_pairs) else 1
    pe["cross_copy_rows"] = int((ca != cb).sum())  # data fact, not an error
    within_ok = []
    for c in range(n_copies):
        sel = big_pairs[(ca == c) & (cb == c)].copy()
        sel["id_a"] -= c * STRIDE
        sel["id_b"] -= c * STRIDE
        within_ok.append(
            len(sel) == len(base_pairs)
            and canonical(sel.reset_index(drop=True)).equals(canonical(base_pairs))
        )
    pe["within_copy_rows"] = [int(((ca == c) & (cb == c)).sum()) for c in range(n_copies)]
    pe["within_copy_match_all"] = bool(all(within_ok))
    report[EMB_PAIRS] = pe
    print(EMB_PAIRS, json.dumps(pe), file=sys.stderr)

    ce: dict = {}
    t0 = time.perf_counter()
    big_clusters = QUERIES[EMB_CLUSTERS](spark, sf1).toPandas()
    ce["sf1_spark_rows"] = len(big_clusters)
    ce["sf1_spark_s"] = round(time.perf_counter() - t0, 1)
    con1.register("certified_pairs", oracle_pairs)
    closure = con1.execute(_EMB_CLOSURE_SQL).df()
    ce["sf1_closure_rows"] = len(closure)
    ce["sf1_closure_match"] = bool(
        len(big_clusters) == len(closure)
        and canonical(big_clusters).equals(canonical(closure))
    )
    report[EMB_CLUSTERS] = ce
    print(EMB_CLUSTERS, json.dumps(ce), file=sys.stderr)

    ok = (
        text_ok
        and pe["sf1_oracle_match"]
        and pe["within_copy_match_all"]
        and ce["sf1_closure_match"]
    )
    from importer_spark.cert import cert_stamp

    artifact = {
        "cert": cert_stamp(),
        "sf01_dir": sf01,
        "sf1_dir": sf1,
        "ok": ok,
        "queries": report,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print(json.dumps({"ok": ok, "out": out_path}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
