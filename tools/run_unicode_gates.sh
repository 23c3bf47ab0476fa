#!/usr/bin/env bash
# The Unicode-adversarial certification recipe: regenerate both fuzzed
# dirs and run the all-catalog oracle gate on each, with the four
# DOCUMENTED engine-semantics boundaries routed through --boundary
# SIGNATURES (kind~regex~reason — r7 advice: an unsignatured boundary
# would also absorb unrelated regressions in the named query).
#
# The four boundaries, one root cause each:
#   * part_name_fuzzy_matches (rows): DuckDB levenshtein counts BYTES,
#     Spark/Postgres count codepoints;
#   * string_functions / pii_redaction / doc_fingerprints (values, column-
#     scoped): the JVM's FULL Unicode case mapping (initcap title-casing,
#     İ → i+U+0307, ß → SS, ﬁ → FI) vs DuckDB utf8proc's simple mapping —
#     case TABLE differences, not plan differences; in-code notes live on
#     each query.
#
# Usage: bash tools/run_unicode_gates.sh [cpus]
set -euo pipefail
cd "$(dirname "$0")/.."
CPUS="${1:-16}"

BOUNDARIES=(
  --boundary "part_name_fuzzy_matches=rows~~DuckDB levenshtein counts BYTES, Spark/Postgres count codepoints; engine keeps the reference Postgres semantics"
  --boundary "string_functions=values~in \[('seg_initcap'|'seg_lower'|'seg_upper')(, '(seg_initcap|seg_lower|seg_upper)')*\]~JVM full case mapping (initcap/upper/lower on digraph + one-to-many codepoints İ ß ﬁ) vs DuckDB utf8proc simple mapping — engine case tables, not the plan; note in queries/scalars.py"
  --boundary "pii_redaction=values~in \['redacted'\]~JVM full lower() (İ → i+U+0307) vs utf8proc simple lower (İ → i) in the synthesized contact blob; ASCII regex semantics engine-identical; note in queries/llm_sampling.py"
  --boundary "doc_fingerprints=values~in \['normalized_hash'\]~normalized_hash lowercases text first: JVM full vs utf8proc simple case mapping on İ/ß/ﬁ; content/prefix hashes engine-identical; note in queries/llm_text.py"
)

python tools/make_unicode_fuzzed_data.py /root/testdata/sf0.001 /tmp/unifuzz
SPARK_GRAFT_CPUS="$CPUS" python tools/run_local_gate.py /tmp/unifuzz \
  UNICODE_GATE.json "${BOUNDARIES[@]}"

python tools/make_unicode_fuzzed_data.py /root/testdata/sf0.01 /tmp/unifuzz0.01
SPARK_GRAFT_CPUS="$CPUS" python tools/run_local_gate.py /tmp/unifuzz0.01 \
  UNICODE_GATE_sf0.01.json "${BOUNDARIES[@]}"
