"""Round-10 hardening: import-time validation of the production dials.

All three dials are read at IMPORT time (the margin-planes convention) so
the Spark plan and the oracle SQL baked at registration can never
disagree; validation therefore must also happen at import, which these
tests exercise via a fresh subprocess per case (the module is already
imported in this process).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_IMPORT_SIM = "import importer_spark.queries.llm_text"
_IMPORT_MB = "import importer_spark.queries.llm_similarity"


def _import_with_env(stmt: str, **env) -> subprocess.CompletedProcess:
    full_env = {**os.environ, **{k: str(v) for k, v in env.items()}}
    return subprocess.run(
        [sys.executable, "-c", stmt],
        env=full_env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=120,
    )


@pytest.mark.parametrize(
    "stmt,env,fragment",
    [
        (_IMPORT_SIM, {"SPARK_GRAFT_SIMHASH_BUCKET_CAP": "0"}, "BUCKET_CAP"),
        (_IMPORT_SIM, {"SPARK_GRAFT_SIMHASH_SNM_WINDOW": "1"}, "SNM_WINDOW"),
        (_IMPORT_MB, {"SPARK_GRAFT_MARGIN_PLANES": "0"}, "MARGIN_PLANES"),
        (_IMPORT_MB, {"SPARK_GRAFT_MARGIN_PLANES": "99"}, "MARGIN_PLANES"),
    ],
)
def test_invalid_dial_refused_at_import(stmt, env, fragment):
    proc = _import_with_env(stmt, **env)
    assert proc.returncode != 0, f"import accepted invalid dial {env}"
    assert fragment in proc.stderr, proc.stderr[-500:]


def test_probe_bits_clamped_to_pinned_plane_count():
    """r9 ADVICE (low): with planes pinned BELOW the default floor, the
    probe count must clamp to the pinned value — a probe bit past the
    plane count flips a bit no bucket key carries, producing probe
    buckets no row can occupy (recall silently not delivered)."""
    proc = _import_with_env(
        _IMPORT_MB + "; import importer_spark.queries.llm_similarity as m; "
        "print(m.MB_PROBE_BITS)",
        SPARK_GRAFT_MARGIN_PLANES="2",
        SPARK_GRAFT_MARGIN_PROBES="6",
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    assert proc.stdout.strip().splitlines()[-1] == "2"


def test_negative_probe_env_clamps_to_zero():
    proc = _import_with_env(
        _IMPORT_MB + "; import importer_spark.queries.llm_similarity as m; "
        "print(m.MB_PROBE_BITS)",
        SPARK_GRAFT_MARGIN_PROBES="-3",
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    assert proc.stdout.strip().splitlines()[-1] == "0"


def test_simhash_oracle_bakes_the_import_read_dials():
    """The registered oracle SQL must carry the import-read cap/window —
    the literal the SQL CASE uses is the one the Spark plan uses."""
    from importer_spark.queries import ORACLES
    from importer_spark.queries.llm_text import _SH_CAP, _SH_SNM

    sql = ORACLES["simhash_bucket_capped"]
    assert f"bucket_size <= {_SH_CAP}" in sql
    assert f"bucket_size > {_SH_CAP}" in sql
    if _SH_SNM >= 2:
        assert f"y.rn <= x.rn + {_SH_SNM - 1}" in sql
    else:
        assert "snm_rows" not in sql
