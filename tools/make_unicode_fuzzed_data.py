"""Derive a Unicode-adversarial copy of a testdata dir for text-semantics
fuzzing — the third poison axis after NULLs (make_fuzzed_data.py) and float
specials (make_float_special_data.py).

The shipped testdata is ASCII-clean, so the oracle gate never exercises the
places real multilingual corpora bite a text pipeline: zero-width characters
inside tokens, combining marks, non-breaking/exotic whitespace that is NOT
`\\s`, bidi controls, emoji ZWJ sequences, no-space CJK runs, astral-plane
(4-byte UTF-8) letters, empty and whitespace-only documents, and single
multi-kilobyte tokens. Every STRING column is mutated in ~1-in-8 values,
deterministically per (row key, column) via xxhash64 — bit-reproducible, and
both engines read the identical parquet — with the mutation class rotating
through MUTATIONS by an independent hash, so every class lands in every
column. Values keep their original content (mutations wrap/extend it) except
the `empty` and `whitespace-only` classes, which are the degenerate-document
cases the text family must survive.

Then certify with the ordinary all-catalog gate:

    python tools/make_unicode_fuzzed_data.py /root/testdata/sf0.001 /tmp/unifuzz
    python tools/run_local_gate.py /tmp/unifuzz UNICODE_GATE.json

A pass means Spark and DuckDB agree on every catalog query over adversarial
Unicode — split/length/substring/regex/hash/sort semantics line up on
codepoints both engines see identically (both operate on UTF-8 codepoints;
both `\\s` classes are ASCII-only; both default to binary collation). A
mismatch is either a real engine-semantics bug in a query or a documented
boundary — never silent.

What is NOT mutated, by the same contract as the NULL fuzzer:
  - keys / ids: synthesized upstream, every window tie-break leans on them;
  - events.props: a JSON payload column — injecting raw Unicode around the
    JSON would test malformed-JSON parse divergence (Spark from_json -> NULL
    vs DuckDB json errors), which is ingest-validation territory
    (io.read_jsonl), not string semantics; the float-special gate already
    covers props-value poisoning inside valid JSON;
  - non-string columns (dates, numerics): covered by the other two fuzzers.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # fuzz_common

MUTATE_RATE_DENOM = 8  # 1-in-8 string values mutated

# Adversarial snippets, every escape explicit (no invisible source literals).
ZWSP = "\u200b"
COMBINING_ACUTE = "\u0301"
NBSP = "\u00a0"
RLO = "\u202e"  # right-to-left override
ZWJ = "\u200d"
LINE_SEP = "\u2028"
NEL = "\u0085"
ARABIC = "\u0645\u0631\u062d\u0628\u0627"  # "marhaba"
CJK = "数据清洗流水线"
EMOJI_ZWJ = "\U0001f469" + ZWJ + "\U0001f4bb" + "\U0001f525"  # woman-technologist + fire
ASTRAL = "\U0001d518\U0001d52b\U0001d526"  # fraktur U n i (4-byte UTF-8 letters)
MEGA_TOKEN = "龍" * 2000  # one 2000-codepoint token
# Titlecase-vs-uppercase digraphs (r7 verdict #3): U+01C4..U+01CC DŽ/Dž/dž,
# LJ/Lj/lj, NJ/Nj/nj + U+01F1..U+01F3 DZ/Dz/dz — the codepoints where
# Character.toTitleCase (Spark initcap) and upper() (the oracle emulation)
# disagree. Lowercase forms lead the words so initcap must actually act.
DIGRAPHS = "ǆǉǌǳ"  # dž lj nj dz
# Locale-special ONE-TO-MANY case maps (r7 advice): U+0130 İ lowercases to
# i+U+0307 (two codepoints) before title-casing in Spark; ß upper-cases to
# SS in DuckDB but title-cases to itself; ﬁ ligature upper-cases to FI.
ONE_TO_MANY = "İstanbul straße ﬁle"


def _mutations(F):
    """(name, fn: Column -> Column) mutation classes; each stresses ONE
    specific text semantics (see module docstring)."""
    return [
        ("zwsp_in_token", lambda v: F.concat(F.lit(ZWSP), v, F.lit(ZWSP + "x"))),
        ("combining_mark", lambda v: F.concat(v, F.lit(COMBINING_ACUTE))),
        ("nbsp_words", lambda v: F.concat(F.lit("a" + NBSP + "b "), v)),
        ("rtl_arabic", lambda v: F.concat(F.lit(ARABIC + " "), v)),
        ("bidi_override", lambda v: F.concat(F.lit(RLO), v)),
        ("emoji_zwj", lambda v: F.concat(v, F.lit(" " + EMOJI_ZWJ))),
        ("cjk_run", lambda v: F.concat(F.lit(CJK), v)),
        ("mega_token", lambda v: F.concat(v, F.lit(" " + MEGA_TOKEN))),
        ("empty", lambda v: F.lit("")),
        ("whitespace_only", lambda v: F.lit("  \t ")),
        ("line_separators", lambda v: F.concat(F.lit("a" + LINE_SEP + "b" + NEL + "c "), v)),
        ("astral_plane", lambda v: F.concat(F.lit(ASTRAL + " "), v)),
        # 13th class (r7 verdict #3): words STARTING with a lowercase
        # digraph codepoint — initcap title-cases (dž→Dž) where the oracle's
        # upper(left(w,1)) upper-cases (dž→DŽ). Mutated values route any
        # divergence to --boundary with a values~seg_initcap signature.
        ("titlecase_digraph", lambda v: F.concat(F.lit(DIGRAPHS + "a "), v, F.lit(" " + DIGRAPHS))),
        # 14th class (r7 advice): one-to-many case mappings (İ, ß, ﬁ) where
        # lowercase/titlecase/uppercase change codepoint COUNT, not just
        # identity — stresses initcap, upper/lower, AND length().
        ("one_to_many_case", lambda v: F.concat(F.lit(ONE_TO_MANY + " "), v)),
    ]


# Row identities and the hash gate come from the shared fuzzer scaffolding
# (tools/fuzz_common.py — one map for all three poison axes). All STRING
# columns outside ids/props are mutated (resolved from the schema at run).
from fuzz_common import ID_COLS, KEY_SUFFIXES, fuzz_session, hash_gate  # noqa: E402

EXCLUDE = {"events": {"props"}}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/unifuzz"

    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    spark = fuzz_session("make_unicode_fuzzed_data")
    muts = _mutations(F)

    for table, id_cols in ID_COLS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, StringType)
            and not f.name.endswith(KEY_SUFFIXES)
            and f.name not in id_cols
            and f.name not in EXCLUDE.get(table, set())
        ]
        out_cols = []
        for c in df.columns:
            if c in cols:
                gate = hash_gate(table, c, MUTATE_RATE_DENOM) == 0
                kind = hash_gate(table, c, len(muts), salt="kind")
                mutated_val = None
                for i, (_, fn) in enumerate(muts):
                    expr = fn(F.col(c))
                    mutated_val = (
                        F.when(kind == i, expr)
                        if mutated_val is None
                        else mutated_val.when(kind == i, expr)
                    )
                # NULL values stay NULL: the gate requires isNotNull, so the
                # NULL-fuzz axis stays orthogonal to this one.
                out_cols.append(
                    F.when(gate & F.col(c).isNotNull(), mutated_val.otherwise(F.col(c)))
                    .otherwise(F.col(c))
                    .alias(c)
                )
            else:
                out_cols.append(F.col(c))
        mutated = df.select(*out_cols)
        mutated.coalesce(1).write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        if cols:
            n_mut = (
                df.select(
                    F.sum(
                        sum(
                            (
                                (hash_gate(table, c, MUTATE_RATE_DENOM) == 0)
                                & F.col(c).isNotNull()
                            ).cast("long")
                            for c in cols
                        )
                    ).alias("n")
                ).collect()[0]["n"]
            )
        else:
            n_mut = 0
        print(f"{table}: mutated {cols} -> {out}/{table}.parquet (~{n_mut} values)")

    spark.stop()


if __name__ == "__main__":
    main()
