"""The Unicode-adversarial fuzzer (tools/make_unicode_fuzzed_data.py) must
be deterministic, class-complete, and NULL-preserving — it is the data
source of the UNICODE_GATE axis, so a bug here silently weakens that
certification."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
TOOL = os.path.join(REPO, "tools", "make_unicode_fuzzed_data.py")
SRC = "/root/testdata/sf0.001"


def _mod():
    spec = importlib.util.spec_from_file_location("make_unicode_fuzzed_data", TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("unifuzz"))
    subprocess.run(
        [sys.executable, TOOL, SRC, out],
        check=True,
        capture_output=True,
        cwd=REPO,
    )
    return out


def test_constants_are_the_documented_codepoints():
    m = _mod()
    assert [ord(c) for c in m.ZWSP + m.COMBINING_ACUTE + m.NBSP + m.RLO] == [
        0x200B,
        0x0301,
        0x00A0,
        0x202E,
    ]
    assert [ord(c) for c in m.ZWJ + m.LINE_SEP + m.NEL] == [0x200D, 0x2028, 0x0085]
    assert len(m.MEGA_TOKEN) == 2000 and len(set(m.MEGA_TOKEN)) == 1
    # the emoji sequence really is a ZWJ sequence (3 emoji + 1 joiner)
    assert m.ZWJ in m.EMOJI_ZWJ and len(m.EMOJI_ZWJ) == 4
    # the digraph class carries LOWERCASE digraph codepoints (dž lj nj dz —
    # where Character.toTitleCase != upper) and the one-to-many class
    # carries İ (U+0130), ß (U+00DF), and the ﬁ ligature (U+FB01)
    assert [ord(c) for c in m.DIGRAPHS] == [0x01C6, 0x01C9, 0x01CC, 0x01F3]
    assert {0x0130, 0x00DF, 0xFB01} <= {ord(c) for c in m.ONE_TO_MANY}


def test_every_mutation_class_lands_in_documents_text(spark, fuzz_dir):
    """documents.text is the LLM-family surface — with 500 docs at 1-in-8
    and 14 rotating classes, every class must appear (expected ~4 each)."""
    m = _mod()
    df = spark.read.parquet(f"{fuzz_dir}/documents.parquet")
    text = [r["text"] for r in df.select("text").collect() if r["text"] is not None]
    probes = {
        "zwsp_in_token": m.ZWSP,
        "combining_mark": m.COMBINING_ACUTE,
        "nbsp_words": "a" + m.NBSP + "b ",
        "rtl_arabic": m.ARABIC,
        "bidi_override": m.RLO,
        "emoji_zwj": m.EMOJI_ZWJ,
        "cjk_run": m.CJK,
        "mega_token": m.MEGA_TOKEN,
        "line_separators": m.LINE_SEP,
        "astral_plane": m.ASTRAL,
        "titlecase_digraph": m.DIGRAPHS + "a ",
        "one_to_many_case": m.ONE_TO_MANY + " ",
    }
    for cls, probe in probes.items():
        assert any(probe in t for t in text), f"class {cls} never landed"
    assert any(t == "" for t in text), "class empty never landed"
    assert any(t == "  \t " for t in text), "class whitespace_only never landed"


def test_nulls_and_unmutated_rows_preserved(spark, fuzz_dir):
    """The NULL axis stays orthogonal (no NULL is created or destroyed) and
    rows outside the 1-in-8 gate are byte-identical to the source."""
    src = spark.read.parquet(f"{SRC}/documents.parquet")
    out = spark.read.parquet(f"{fuzz_dir}/documents.parquet")
    n_null_src = src.filter(F.col("text").isNull()).count()
    n_null_out = out.filter(F.col("text").isNull()).count()
    assert n_null_src == n_null_out
    m = _mod()
    joined = (
        src.select("doc_id", F.col("text").alias("t_src"))
        .join(out.select("doc_id", F.col("text").alias("t_out")), "doc_id")
        .withColumn(
            "gated",
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit("text")), m.MUTATE_RATE_DENOM)
            == 0,
        )
    )
    untouched = joined.filter(~F.col("gated"))
    assert untouched.filter(
        ~F.col("t_src").eqNullSafe(F.col("t_out"))
    ).count() == 0, "an ungated row changed"
    mutated = joined.filter(
        F.col("gated") & F.col("t_src").isNotNull() & (F.col("t_src") != "")
    )
    assert mutated.filter(F.col("t_src") == F.col("t_out")).count() < mutated.count()


def test_fuzzer_is_deterministic(spark, fuzz_dir, tmp_path_factory):
    """Same source -> byte-identical mutation decisions (hash-gated, no RNG):
    re-running the tool reproduces documents.text exactly."""
    out2 = str(tmp_path_factory.mktemp("unifuzz2"))
    subprocess.run(
        [sys.executable, TOOL, SRC, out2], check=True, capture_output=True, cwd=REPO
    )
    a = spark.read.parquet(f"{fuzz_dir}/documents.parquet")
    b = spark.read.parquet(f"{out2}/documents.parquet")
    assert (
        a.select("doc_id", "text", "lang", "source")
        .exceptAll(b.select("doc_id", "text", "lang", "source"))
        .count()
        == 0
    )
