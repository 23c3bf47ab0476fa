"""Text-analysis operators for LLM-data pipelines (BASELINE.json north star):
tokenization, shingling, language-ID scoring, quality scoring, fingerprints,
MinHash signatures, SimHash. All pure Column expressions over arrays — no
Python UDFs, so everything stays JVM-side and codegen-eligible; at 100 TB the
per-row cost is a handful of hash calls.

Hashing convention: md5 hex strings compared lexicographically. This is
engine-portable (identical in any md5+utf8 system), unlike 64-bit integer
hashes whose overflow semantics differ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX = "0123456789abcdef"

STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "das", "und"],
    "es": ["el", "la", "los", "y"],
    "fr": ["le", "les", "et", "dans"],
    "zh": ["的", "是", "了", "在"],
}
LANG_PRECEDENCE = ["en", "de", "es", "fr", "zh"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (documents are single-spaced)."""
    return F.split(text, " ")


def quality_score(text: Column) -> Column:
    """Length/diversity/char-density quality composite — the SAME formula
    the oracle-certified `doc_quality_scores` query (queries/llm_text.py)
    and the `dedup_keep_best` survivor policy pin; exposed as a Column
    function so pipelines (e.g. the `refine` CLI) can score arbitrary text
    columns without re-deriving it. Rounded to 6 places (house rule)."""
    t = tokens(text)
    nt = F.size(t)
    diversity = F.size(F.array_distinct(t)).cast("double") / F.nullif(nt, F.lit(0))
    return F.round(
        F.least(F.lit(100.0), nt / 5.0) * 0.4
        + diversity * 100.0 * 0.4
        + F.least(
            F.lit(100.0),
            F.length(text).cast("double") / F.nullif(nt, F.lit(0)) * 10.0,
        )
        * 0.2,
        6,
    )


def lsh_band_keys(sig_cols: list[Column], band_size: int) -> list[Column]:
    """Group signature components into bands; equal band key → candidate pair.
    With r rows/band and b bands, P(candidate) = 1-(1-j^r)^b."""
    assert len(sig_cols) % band_size == 0
    return [
        F.md5(F.concat_ws("|", *sig_cols[b : b + band_size]))
        for b in range(0, len(sig_cols), band_size)
    ]


def jaccard(a: Column, b: Column, scale: int | None = None) -> Column:
    """Set Jaccard of two string arrays (exact int/int division — portable)."""
    j = F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))
    return F.round(j, scale) if scale is not None else j


def lang_scores(toks: Column) -> dict[str, Column]:
    """Stopword-hit count per language, with term frequency (the n-gram
    heuristic from SURVEY §7.4 / BASELINE text-analysis ops)."""
    def hits(ws):
        def pred(t):
            cond = t == ws[0]
            for w in ws[1:]:
                cond = cond | (t == w)
            return cond

        return F.size(F.filter(toks, pred))

    return {lang: hits(ws) for lang, ws in STOPWORDS.items()}


def lang_predict(scores: dict[str, Column]) -> Column:
    """Argmax with fixed precedence order for ties; 'unknown' when all zero."""
    g = F.greatest(*scores.values())
    expr = F.when(g == 0, "unknown")
    for lang in LANG_PRECEDENCE:
        expr = expr.when(scores[lang] == g, lang)
    return expr.otherwise("unknown")


def simhash32(md5_hex: Column, bit: int) -> Column:
    """±1 contribution of one token's hash to SimHash bit ``bit`` (0..31):
    bit b of the first 8 hex chars of md5 (big-endian nibbles, so bit b is
    (value >> (31-b)) & 1). Decode with :func:`simhash_prefix_long` once per
    token and pass the LONG here — 32 integer shift/mask votes on one
    column stay in whole-stage codegen, vs. the per-bit substring+strpos
    string decode this replaces (measured ~2× on the fingerprint agg at
    10× bench scale). The SQL oracle keeps the per-hex-char form; the bit
    arithmetic is provably identical: 4·(7−b÷4)+(3−b%4) = 31−b."""
    b = F.shiftright(md5_hex, 31 - bit).bitwiseAND(F.lit(1))
    return F.when(b == 1, 1).otherwise(-1)


def simhash_prefix_long(md5_hex: Column) -> Column:
    """First 8 hex chars of an md5 digest as a BIGINT (one string decode
    per token; every SimHash bit then reads this long)."""
    return F.conv(F.substring(md5_hex, 1, 8), 16, 10).cast("bigint")


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    strip (reference X3 normalize_customer_name analog:
    domain_consolidation.py:102-132)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
