"""Generate a Zipf-duplicated corpus for capped-probe RECALL measurement
(r7 verdict #4).

The emit caps (`cosine_pairs_probe(max_pairs_per_probe=…)`,
`_simhash_pairs(bucket_cap=…)`) are certified for subset / bound /
overflow semantics (tests/test_emit_caps.py) and their THROUGHPUT is swept
on the clone-heavy scaled data — but clone-heavy data is the cap's
worst case, not its operating point. Real web-scale corpora duplicate on
a Zipf law (a huge unique tail, many small clusters, a few big ones —
Lee et al. 2022 'Deduplicating Training Data Makes Language Models
Better' measures exactly this shape), and the cap's RECALL depends on
that cluster-size distribution: a probe only saturates when its cluster
exceeds the cap. This tool materializes that distribution so
tools/recall_curve.py can measure recall-vs-cap where it matters.

Corpus construction (deterministic, numpy PCG64 seed 7):
  - a DUP_FRACTION of the docs (default 0.35 — the C4/RealNews order of
    magnitude Lee et al. 2022 measure; a naive all-Zipf draw puts >90% of
    the DOC mass in clusters, which is the clone-heavy sweep corpus again,
    not an operating point) live in duplicate clusters whose sizes are
    drawn from a truncated Zipf(a) conditioned on ≥2; the rest are
    singletons. The heavy tail is truncated at n/40, so a handful of
    ~500-member clusters at n=20k make every cap in the measured range
    saturate on SOMETHING;
  - each cluster has a template text (40–160 tokens over the testdata's
    vocabulary) and each member perturbs ~2% of its tokens — a NEAR dup
    (high shingle-Jaccard, small SimHash Hamming distance), not a clone;
  - each cluster has a unit centroid in R^64; members add σ=0.06 Gaussian
    noise and re-normalize, so within-cluster cosine ≳ 0.95 while
    cross-cluster cosine concentrates near 0 — the 0.45 probe threshold
    separates them cleanly.

Output: documents.parquet + embeddings.parquet in the testdata schema
(doc_id == vec_id, label = cluster id), plus _clusters.json (the ground
cluster-size histogram, recorded so the recall artifact can show WHICH
distribution the curve was measured on).

Usage: python tools/make_zipf_dup_data.py [out_dir] [n_docs] [zipf_a] [dup_fraction]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_STEMS = (
    "key agg row scan slow fast table value part hash merge batch window "
    "spark order data column join small line customer query filter the a "
    "shuffle sort broadcast bucket salt skew cache spill codegen arrow "
    "plan stage task executor driver memory disk network token gram"
).split()
# A ~2.3k-word vocabulary (stem + numeric suffix). Each cluster samples its
# OWN ~80-word sub-vocabulary from it: unrelated clusters then have nearly
# disjoint token distributions, like real documents. (A first draft drew
# every doc from one shared 46-word pool — that made ALL 20k docs SimHash
# near-collide, since simhash fingerprints the token DISTRIBUTION and every
# doc had the same one: 5.5M "truth" pairs on a 35%-dup corpus, pure
# generator artifact.)
VOCAB = [f"{w}{i}" for w in _STEMS for i in range(50)]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zipfdup"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    zipf_a = float(sys.argv[3]) if len(sys.argv) > 3 else 1.7
    dup_fraction = float(sys.argv[4]) if len(sys.argv) > 4 else 0.35
    rng = np.random.Generator(np.random.PCG64(7))

    # Duplicated mass: Zipf(a) cluster sizes conditioned on >= 2,
    # truncated at n_docs/40, until dup_fraction of the doc budget is
    # filled; everything else is singleton clusters.
    dup_budget = int(n_docs * dup_fraction)
    sizes: list[int] = []
    cap = max(2, n_docs // 40)
    filled = 0
    while filled < dup_budget:
        s = int(rng.zipf(zipf_a))
        if s < 2:
            continue
        s = min(s, cap, dup_budget - filled)
        if s < 2:  # a 1-doc remainder joins the singleton pool instead
            break
        sizes.append(s)
        filled += s
    sizes.extend([1] * (n_docs - filled))

    doc_ids, texts, langs, sources, labels = [], [], [], [], []
    vecs = np.empty((sum(sizes), 64), dtype=np.float32)
    doc_id = 0
    vocab_arr = np.array(VOCAB)
    for cluster_id, size in enumerate(sizes):
        n_tok = int(rng.integers(40, 160))
        sub_vocab = rng.choice(vocab_arr, size=80, replace=False)
        template = rng.choice(sub_vocab, size=n_tok)
        centroid = rng.normal(size=64)
        centroid /= np.linalg.norm(centroid)
        for _ in range(size):
            toks = template.copy()
            n_mut = max(1, int(0.02 * n_tok)) if size > 1 else 0
            if n_mut:
                idx = rng.choice(n_tok, size=n_mut, replace=False)
                toks[idx] = rng.choice(vocab_arr, size=n_mut)
            text = " ".join(toks)
            v = centroid + rng.normal(scale=0.06, size=64)
            v /= np.linalg.norm(v)
            doc_ids.append(doc_id)
            texts.append(text)
            langs.append("en")
            sources.append(f"src{cluster_id % 8}")
            labels.append(cluster_id)
            vecs[doc_id] = v.astype(np.float32)
            doc_id += 1

    os.makedirs(out, exist_ok=True)
    docs = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, f"{out}/documents.parquet")
    emb = pa.table(
        {
            "vec_id": pa.array(doc_ids, pa.int64()),
            "embedding": pa.array(
                [vecs[i].tolist() for i in range(len(doc_ids))],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(emb, f"{out}/embeddings.parquet")

    hist: dict[int, int] = {}
    for s in sizes:
        hist[s] = hist.get(s, 0) + 1
    profile = {
        "n_docs": len(doc_ids),
        "n_clusters": len(sizes),
        "zipf_a": zipf_a,
        "dup_fraction": round(
            sum(s for s in sizes if s > 1) / len(doc_ids), 4
        ),
        "max_cluster": max(sizes),
        "singleton_clusters": hist.get(1, 0),
        "size_histogram": {str(k): v for k, v in sorted(hist.items())},
    }
    with open(f"{out}/_clusters.json", "w") as fh:
        json.dump(profile, fh, indent=1)
    print(json.dumps(profile))


if __name__ == "__main__":
    main()
