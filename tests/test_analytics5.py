"""Round-5 query algorithms vs plain-Python references — a THIRD independent
derivation next to the Spark plan and the DuckDB oracle (the property-test
pattern of test_bpe.py/test_graph.py): same deterministic conventions
(md5-derived gates, round-9 logs, exact-decimal sums) re-implemented with
dicts and math.log, no dataframes."""

from __future__ import annotations

import hashlib
import math
from decimal import Decimal

from tests.conftest import SF_DIR


def _md5_even(doc_id: int) -> bool:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16) % 2 == 0


def _r9(x: float) -> Decimal:
    # engine convention: round(x, 9) then exact decimal accumulation.
    # quantize via string formatting (half-away like Spark/DuckDB ROUND)
    return Decimal(f"{x:.9f}")


def test_nb_classifier_matches_python_reference(spark):
    from importer_spark.io import Tables
    from importer_spark.queries import QUERIES

    docs = [
        (r["doc_id"], r["source"], r["text"].split(" "))
        for r in Tables(spark, SF_DIR).documents.collect()
    ]
    train = [d for d in docs if _md5_even(d[0])]
    cnt: dict[tuple[str, str], int] = {}
    tot: dict[str, int] = {}
    nd: dict[str, int] = {}
    vocab = set()
    for _id, src, toks in train:
        nd[src] = nd.get(src, 0) + 1
        for t in toks:
            cnt[(src, t)] = cnt.get((src, t), 0) + 1
            tot[src] = tot.get(src, 0) + 1
            vocab.add(t)
    v, ndt = len(vocab), sum(nd.values())
    classes = sorted(nd)
    want = {}
    for doc_id, src, toks in docs:
        best = None
        for c in classes:
            s = _r9(math.log(nd[c] / ndt))
            for t in toks:
                k = cnt.get((c, t))
                num = (k + 1) if k else 1
                s += _r9(math.log(num / (tot[c] + v)))
            if best is None or s > best[1]:  # strict > keeps the LOWER class on ties
                best = (c, s)
        want[doc_id] = (best[0], float(best[1]), src, best[0] == src)

    got = {
        r["doc_id"]: (
            r["pred_source"], r["nb_logprob"], r["actual_source"], r["is_correct"]
        )
        for r in QUERIES["nb_source_classifier"](spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0], did
        assert abs(got[did][1] - want[did][1]) < 1e-9, did
        assert got[did][2:] == want[did][2:], did


def test_weighted_sample_es_matches_python_reference(spark):
    from importer_spark.io import Tables
    from importer_spark.queries import QUERIES
    from importer_spark.queries.analytics5 import _ES_K

    rows = [
        (r["doc_id"], r["source"], r["n_chars"])
        for r in Tables(spark, SF_DIR).documents.collect()
    ]
    keyed = []
    for doc_id, src, w in rows:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967297.0
        e = float(f"{-float(f'{math.log(u):.9f}') / w:.9f}")
        keyed.append((src, e, doc_id, w))
    want = set()
    by_src: dict[str, list] = {}
    for src, e, doc_id, w in keyed:
        by_src.setdefault(src, []).append((e, doc_id, w))
    for src, lst in by_src.items():
        for rank, (e, doc_id, w) in enumerate(sorted(lst)[:_ES_K], 1):
            want.add((doc_id, src, w, e, rank))

    got = {
        (r["doc_id"], r["source"], r["n_chars"], r["es_key"], r["rank"])
        for r in QUERIES["weighted_sample_es"](spark, SF_DIR).collect()
    }
    assert got == want
