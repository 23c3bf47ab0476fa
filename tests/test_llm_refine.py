"""Round-5 refinement queries vs plain-Python references — the third
independent derivation next to the Spark plan and the DuckDB oracle
(test_analytics5.py pattern): brute-force dicts/lists/math, no dataframes,
same deterministic conventions (round-9 logs, exact decimal sums,
half-away rounding)."""

from __future__ import annotations

import hashlib
import math
from decimal import Decimal

from tests.conftest import SF_DIR


def _docs(spark):
    from importer_spark.io import Tables

    return [
        (r["doc_id"], r["lang"], r["source"], r["text"])
        for r in Tables(spark, SF_DIR).documents.collect()
    ]


def _removal_reference(docs):
    """Brute-force ExactSubstr removal: positions covered by 8-grams seen in
    >= 2 distinct docs, merged into islands (gap > 8 breaks), text rebuilt
    without covered tokens."""
    toks = {d: t.split(" ") for d, _l, _s, t in docs}
    gram_docs: dict[tuple, set] = {}
    for d, t in toks.items():
        for i in range(len(t) - 7):
            gram_docs.setdefault(tuple(t[i : i + 8]), set()).add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    out = {}
    for d, t in toks.items():
        hits = [i for i in range(len(t) - 7) if tuple(t[i : i + 8]) in dup]
        spans = []
        for p in hits:
            if spans and p - spans[-1][1] <= 8:  # [1] holds last hit pos
                spans[-1][1] = p
            else:
                spans.append([p, p])
        covered = set()
        for s, last in spans:
            covered.update(range(s, last + 8))
        kept = [t[i] for i in range(len(t)) if i not in covered]
        clean = " ".join(kept)
        out[d] = (
            len(t),
            len(t) - len(kept),
            len(kept),
            hashlib.md5(clean.encode()).hexdigest(),
        )
    return out


def test_exact_substring_removal_matches_python_reference(spark):
    from importer_spark.queries import QUERIES

    want = _removal_reference(_docs(spark))
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["removed_tokens"], r["clean_n_tokens"], r["clean_hash"]
        )
        for r in QUERIES["exact_substring_removal"](spark, SF_DIR).collect()
    }
    assert got == want
    # the surgery must actually remove something at this SF (non-vacuous)
    assert any(v[1] > 0 for v in want.values())


def test_remove_duplicate_spans_operator_strings(spark):
    """The operator's actual clean_text strings (not just the query's hash)
    against the brute-force rebuild, including the fully-removed /
    empty-doc disambiguation carried by clean_n_tokens."""
    import hashlib as _h

    from importer_spark.io import Tables
    from importer_spark.operators.dedup import remove_duplicate_spans

    docs = _docs(spark)
    want = _removal_reference(docs)
    got = {
        r["doc_id"]: (r["clean_text"], r["clean_n_tokens"])
        for r in remove_duplicate_spans(
            Tables(spark, SF_DIR).documents, "doc_id", "text"
        ).collect()
    }
    assert set(got) == set(want)
    for d, (_n, _rm, kn, md5) in want.items():
        assert got[d][1] == kn, d
        assert _h.md5(got[d][0].encode()).hexdigest() == md5, d


def test_remove_duplicate_spans_incremental_equals_full_slice(spark):
    """The store-probed incremental removal must rewrite a batch doc to
    exactly the bytes the FULL-corpus computation produces (brute-force
    Python reference over corpus ∪ batch, restricted to the batch)."""
    import hashlib as _h

    from importer_spark.io import Tables
    from importer_spark.operators.dedup import (
        ngram_store,
        remove_duplicate_spans_incremental,
    )
    from pyspark.sql import functions as F

    docs = _docs(spark)
    want = {d: v for d, v in _removal_reference(docs).items() if d % 5 == 0}
    t = Tables(spark, SF_DIR)
    is_new = F.col("doc_id") % 5 == 0
    store = ngram_store(t.documents.filter(~is_new), "doc_id", "text")
    cleaned, _delta = remove_duplicate_spans_incremental(
        t.documents.filter(is_new), store, "doc_id", "text"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["clean_n_tokens"])
        for r in cleaned.collect()
    }
    assert set(got) == set(want)
    for d, (_n, _rm, kn, md5) in want.items():
        assert got[d][1] == kn, d
        assert _h.md5(got[d][0].encode()).hexdigest() == md5, d


def test_ccnet_buckets_match_python_reference(spark):
    from importer_spark.queries import QUERIES

    docs = _docs(spark)
    # unigram LM scores, engine convention: per-token round-9 log-probs
    # summed exactly, ONE double divide rounded to 6
    cnt: dict[str, int] = {}
    for _d, _l, _s, text in docs:
        for t in text.split(" "):
            cnt[t] = cnt.get(t, 0) + 1
    total = sum(cnt.values())
    lp = {t: Decimal(f"{math.log(c / total):.9f}") for t, c in cnt.items()}
    score = {}
    for d, lang, _s, text in docs:
        toks = text.split(" ")
        s = sum((lp[t] for t in toks), Decimal(0))
        score[d] = (lang, float(f"{float(s) / len(toks):.6f}"))
    # per-lang exact tercile cuts, linear interpolation (percentile_cont)
    def cut(vals, p):
        vals = sorted(vals)
        idx = (len(vals) - 1) * p
        lo = int(math.floor(idx))
        frac = idx - lo
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (vals[hi] - vals[lo]) * frac

    by_lang: dict[str, list] = {}
    for lang, v in score.values():
        by_lang.setdefault(lang, []).append(v)
    cuts = {
        lang: (cut(vs, 1.0 / 3.0), cut(vs, 2.0 / 3.0))
        for lang, vs in by_lang.items()
    }
    want = {}
    for d, (lang, v) in score.items():
        q1, q2 = cuts[lang]
        want[d] = (lang, v, "head" if v >= q2 else "middle" if v >= q1 else "tail")

    got = {
        r["doc_id"]: (r["lang"], r["avg_logprob"], r["bucket"])
        for r in QUERIES["ccnet_perplexity_buckets"](spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert abs(got[d][1] - want[d][1]) < 1e-9, d
        assert got[d][2] == want[d][2], d
    assert {b for _l, _v, b in got.values()} == {"head", "middle", "tail"}


def _quality(text: str) -> float:
    toks = text.split(" ")
    n, u, c = len(toks), len(set(toks)), len(text)
    return float(
        f"{min(100.0, n / 5.0) * 0.4 + (u / n) * 100.0 * 0.4 + min(100.0, (c / n) * 10.0) * 0.2:.6f}"
    )


def test_dedup_keep_best_survivor_invariants(spark):
    """Cluster membership is oracle-certified (near_dup_clusters); this
    checks the POLICY layer independently: exactly one survivor per
    cluster, and it is the (quality desc, doc_id asc) maximum over the
    cluster's members, with quality recomputed by the Python formula."""
    from importer_spark.queries import QUERIES

    q = {d: _quality(t) for d, _l, _s, t in _docs(spark)}
    rows = QUERIES["dedup_keep_best"](spark, SF_DIR).collect()
    assert rows, "no near-dup clusters at this SF?"
    by_cluster: dict[int, list] = {}
    for r in rows:
        assert abs(r["quality_score"] - q[r["doc_id"]]) < 1e-9, r["doc_id"]
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert len(members) == members[0]["cluster_size"] == len(
            {m["doc_id"] for m in members}
        ), cid
        kept = [m for m in members if m["is_kept"]]
        assert len(kept) == 1, cid
        best = min(members, key=lambda m: (-q[m["doc_id"]], m["doc_id"]))
        assert kept[0]["doc_id"] == best["doc_id"], cid


def test_nb_calibration_matches_python_reference(spark):
    from importer_spark.queries import QUERIES

    def _r9(x):
        return Decimal(f"{x:.9f}")

    docs = [(d, s, t.split(" ")) for d, _l, s, t in _docs(spark)]
    train = [
        x
        for x in docs
        if int(hashlib.md5(str(x[0]).encode()).hexdigest()[:2], 16) % 2 == 0
    ]
    cnt: dict[tuple, int] = {}
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
    bins: dict[int, list] = {}
    for doc_id, src, toks in docs:
        scores = []
        for c in classes:
            s = _r9(math.log(nd[c] / ndt))
            for t in toks:
                k = cnt.get((c, t))
                s += _r9(math.log(((k + 1) if k else 1) / (tot[c] + v)))
            scores.append((s, c))
        srt = sorted(scores, key=lambda x: x[0], reverse=True)
        pred = min(scores, key=lambda x: (-x[0], x[1]))[1]
        margin = float(srt[0][0] - srt[1][0])
        mpt = float(f"{margin / len(toks):.6f}")
        b = min(int(math.floor(mpt * 100)), 9)
        bins.setdefault(b, []).append((mpt, pred == src))
    want = {}
    for b, xs in bins.items():
        n = len(xs)
        acc = float(f"{sum(1 for _m, ok in xs if ok) / n:.6f}")
        avg = float(f"{float(sum((Decimal(f'{m:.6f}') for m, _ok in xs), Decimal(0))) / n:.6f}")
        want[b] = (n, acc, avg)

    got = {
        r["margin_bucket"]: (r["n_docs"], r["accuracy"], r["avg_margin"])
        for r in QUERIES["nb_confidence_calibration"](spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for b in want:
        assert got[b][0] == want[b][0], b
        assert abs(got[b][1] - want[b][1]) < 1e-9, b
        assert abs(got[b][2] - want[b][2]) < 1e-9, b


def test_margin_bitext_matches_python_reference(spark):
    """margin_bitext_mine vs a brute-force plain-Python derivation: same
    LSH buckets, sequential-fold cosines, Decimal(18,9) kNN means, mutual
    best, ratio-margin cut — no dataframes on the reference side."""
    from importer_spark.io import Tables
    from importer_spark.queries import QUERIES
    from importer_spark.queries.llm_similarity import (
        MB_K,
        MB_THRESHOLD,
        MB_PLANES_POOL,
        _mb_adaptive_planes,
    )

    rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in Tables(spark, SF_DIR).embeddings.collect()
        if r["vec_id"] is not None and r["embedding"] is not None
    ]
    planes = MB_PLANES_POOL[: _mb_adaptive_planes(len(rows))]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def bucket(emb):
        return sum(1 << j for j, p in enumerate(planes) if dot(emb, p) > 0)

    def cos9(a, b):
        c = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
        return Decimal(f"{c:.9f}")

    by_bucket: dict[int, tuple[list, list]] = {}
    for vid, emb in rows:
        side = by_bucket.setdefault(bucket(emb), ([], []))[vid % 2]
        side.append((vid, emb))
    cand = [
        (s, t, cos9(se, te))
        for srcs, tgts in by_bucket.values()
        for s, se in srcs
        for t, te in tgts
    ]

    def knn_mean(pairs, key_idx, other_idx):
        per: dict[int, list] = {}
        for c in pairs:
            per.setdefault(c[key_idx], []).append((-c[2], c[other_idx]))
        return {
            k: float(sum(-c for c, _ in sorted(v)[:MB_K])) / min(MB_K, len(v))
            for k, v in per.items()
        }

    m_src = knn_mean(cand, 0, 1)
    m_tgt = knn_mean(cand, 1, 0)
    scored = [
        (s, t, c, float(c) / ((m_src[s] + m_tgt[t]) / 2))
        for s, t, c in cand
        if (m_src[s] + m_tgt[t]) > 0
    ]
    best_s = {}
    best_t = {}
    for s, t, c, mg in scored:
        if s not in best_s or (-mg, t) < (-best_s[s][3], best_s[s][1]):
            best_s[s] = (s, t, c, mg)
        if t not in best_t or (-mg, s) < (-best_t[t][3], best_t[t][0]):
            best_t[t] = (s, t, c, mg)
    want = {
        (s, t, f"{float(c):.6f}", f"{mg:.6f}")
        for s, t, c, mg in best_s.values()
        if best_t[t][:2] == (s, t) and float(f"{mg:.6f}") >= MB_THRESHOLD
    }

    got = {
        (r["src_id"], r["tgt_id"], f"{r['cosine']:.6f}", f"{r['margin']:.6f}")
        for r in QUERIES["margin_bitext_mine"](spark, SF_DIR).collect()
    }
    assert got == want
    assert len(want) > 0  # non-vacuous at this SF


def test_quality_auc_matches_pair_counting(spark):
    """quality_auc_by_source vs the O(n^2) definition of AUC: over every
    (positive, negative) pair within a source, wins + half-ties over
    n_pos*n_neg — the definitional derivation, no ranks at all."""
    from importer_spark.queries import QUERIES

    docs = _docs(spark)
    by_src: dict[str, list] = {}
    for _d, lang, src, text in docs:
        if text is None or lang is None or src is None:
            continue
        by_src.setdefault(src, []).append((_quality(text), lang == "en"))
    want = {}
    for src, rows in by_src.items():
        pos = [s for s, p in rows if p]
        neg = [s for s, p in rows if not p]
        if not pos or not neg:
            want[src] = (len(pos), len(neg), None)
            continue
        wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
        want[src] = (len(pos), len(neg), float(f"{wins / (len(pos) * len(neg)):.6f}"))

    got = {
        r["source"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in QUERIES["quality_auc_by_source"](spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for src in want:
        assert got[src][0] == want[src][0] and got[src][1] == want[src][1], src
        if want[src][2] is None:
            assert got[src][2] is None, src
        else:
            assert abs(got[src][2] - want[src][2]) < 1e-9, (src, got[src], want[src])


def _nb_lang_reference(docs):
    """Plain-Python char-trigram multinomial NB (engine convention: per-
    trigram round-9 Decimal log-probs, exact Decimal sums, priors, argmax
    ties to the alphabetically first class) — the third derivation behind
    lang_id_ngram_nb / lang_id_kappa / lang_id_class_f1."""
    labeled = [
        (d, lang, " " + text + " ")
        for d, lang, _s, text in docs
        if lang is not None and text is not None and len(text) >= 1
    ]
    cls_cnt: dict[str, dict[str, int]] = {}
    cls_tot: dict[str, int] = {}
    nd: dict[str, int] = {}
    vocab: set[str] = set()
    for _d, lang, p in labeled:
        nd[lang] = nd.get(lang, 0) + 1
        c = cls_cnt.setdefault(lang, {})
        for i in range(len(p) - 2):
            g = p[i : i + 3]
            vocab.add(g)
            c[g] = c.get(g, 0) + 1
            cls_tot[lang] = cls_tot.get(lang, 0) + 1
    classes = sorted(nd)
    v = len(vocab)
    ndt = sum(nd.values())
    lp = {
        cls: {
            g: Decimal(f"{math.log((c + 1) / (cls_tot[cls] + v)):.9f}")
            for g, c in cnt.items()
        }
        for cls, cnt in cls_cnt.items()
    }
    lp0 = {
        cls: Decimal(f"{math.log(1 / (cls_tot[cls] + v)):.9f}") for cls in classes
    }
    pri = {cls: Decimal(f"{math.log(nd[cls] / ndt):.9f}") for cls in classes}
    preds = {}
    for d, lang, p in labeled:
        grams = [p[i : i + 3] for i in range(len(p) - 2)]
        best_cls, best_s = None, None
        for cls in classes:  # ascending -> first max wins ties
            s = sum((lp[cls].get(g, lp0[cls]) for g in grams), Decimal(0)) + pri[cls]
            if best_s is None or s > best_s:
                best_cls, best_s = cls, s
        preds[d] = (lang, best_cls, float(best_s))
    return preds


def test_lang_id_ngram_nb_matches_python_reference(spark):
    """Per-doc NB predictions vs the plain-Python model — every doc\'s
    predicted class and (6dp) log-prob must agree."""
    from importer_spark.queries import QUERIES

    want = _nb_lang_reference(_docs(spark))
    got = {
        r["doc_id"]: (r["labeled_lang"], r["predicted_lang"], r["nb_logprob"])
        for r in QUERIES["lang_id_ngram_nb"](spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for d, (lang, pred, s) in want.items():
        assert got[d][0] == lang and got[d][1] == pred, d
        assert abs(got[d][2] - s) < 1e-6, d


def test_lang_id_kappa_matches_confusion_counting(spark):
    """lang_id_kappa vs the definitional derivation: build the confusion
    matrix from the plain-Python NB reference predictions, then kappa from
    integer marginals with one final division."""
    from importer_spark.queries import QUERIES

    cells: dict[tuple, int] = {}
    for lang, pred, _s in _nb_lang_reference(_docs(spark)).values():
        cells[(lang, pred)] = cells.get((lang, pred), 0) + 1
    n = sum(cells.values())
    diag = sum(v for (a, b), v in cells.items() if a == b)
    rows: dict[str, int] = {}
    cols: dict[str, int] = {}
    for (a, b), v in cells.items():
        rows[a] = rows.get(a, 0) + v
        cols[b] = cols.get(b, 0) + v
    pe_num = sum(rn * cols.get(c, 0) for c, rn in rows.items())
    want_kappa = (
        float(f"{(n * diag - pe_num) / (n * n - pe_num):.6f}")
        if n * n - pe_num > 0
        else None
    )

    r = QUERIES["lang_id_kappa"](spark, SF_DIR).collect()[0]
    assert r["n_docs"] == n
    assert abs(r["po"] - float(f"{diag / n:.6f}")) < 1e-9
    assert abs(r["pe"] - float(f"{pe_num / (n * n):.6f}")) < 1e-9
    if want_kappa is None:
        assert r["kappa"] is None
    else:
        assert abs(r["kappa"] - want_kappa) < 1e-9
    # the whole point of the r6 swap: a trained classifier with real
    # agreement (the stopword heuristic measured kappa ~0.0016 here)
    assert want_kappa is not None and want_kappa > 0.2


def test_segment_dedup_removal_matches_python_reference(spark):
    """Third derivation of segment_dedup_removal: brute-force Python —
    disjoint 16-token segments, global first-occurrence by (doc_id, seg),
    rebuild — must agree with the Spark/agg-join answer doc for doc,
    including the rebuilt-text md5."""
    import hashlib

    W = 16
    segs = []  # (doc_id, seg, seg_text, seg_tokens) in corpus order
    for d, _lang, _s, text in sorted(_docs(spark)):
        if text is None:
            continue
        t = text.split(" ")
        n_seg = (len(t) + W - 1) // W
        for k in range(n_seg):
            part = t[k * W : k * W + W]
            segs.append((d, k, " ".join(part), len(part)))
    seen: set[str] = set()
    want: dict[int, list] = {}
    for d, k, st, sn in segs:  # sorted (doc_id, seg) = corpus order
        rec = want.setdefault(d, [0, 0, 0, []])
        rec[0] += 1
        if st in seen:
            rec[1] += 1
        else:
            seen.add(st)
            rec[2] += sn
            rec[3].append(st)
    from importer_spark.queries import QUERIES

    got = {
        r["doc_id"]: r
        for r in QUERIES["segment_dedup_removal"](spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    removed_total = 0
    for d, (ns, rm, kn, kept) in want.items():
        r = got[d]
        assert (r["n_segments"], r["removed_segments"], r["clean_n_tokens"]) == (
            ns,
            rm,
            kn,
        ), d
        assert r["clean_hash"] == hashlib.md5(
            " ".join(kept).encode()
        ).hexdigest(), d
        removed_total += rm
    assert removed_total > 0  # the corpus must actually exercise removal


def test_segment_dedup_incremental_is_batch_slice(spark):
    """The incremental probe (persisted segment store + batch rewrite)
    must return EXACTLY the batch-doc rows of the full-corpus rewrite —
    same counts, same rebuilt-text hash, and a nonempty batch."""
    from importer_spark.queries import QUERIES

    full = {
        r["doc_id"]: (
            r["n_segments"],
            r["removed_segments"],
            r["clean_n_tokens"],
            r["clean_hash"],
        )
        for r in QUERIES["segment_dedup_removal"](spark, SF_DIR).collect()
        if r["doc_id"] % 5 == 0
    }
    incr = {
        r["doc_id"]: (
            r["n_segments"],
            r["removed_segments"],
            r["clean_n_tokens"],
            r["clean_hash"],
        )
        for r in QUERIES["segment_dedup_removal_incremental"](
            spark, SF_DIR
        ).collect()
    }
    assert incr and incr == full
