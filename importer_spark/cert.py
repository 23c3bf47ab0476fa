"""Certification stamping: tie every gate artifact to the exact product
tree it certified.

Round-7 produced a real instance of cert drift: a product-code commit
landed after FLOATSPECIAL_SMOKE.json was published, so HEAD's
`operators/fuzzy.py` was covered by six value gates but not the
float-special axis — and nothing recorded which tree each artifact
belonged to, so the lag had to be reconstructed from git log (r7 verdict
#1). Every gate tool now stamps its artifact with :func:`cert_stamp`, and
``tests/test_cert_sync.py`` fails whenever a published gate's tree hash no
longer matches the working tree — code can never silently drift ahead of
its certificates.

The tree hash is content-based (sha256 over the sorted (relpath,
file-sha256) list of everything under ``importer_spark/``), NOT the git
commit id: it is identical for identical product code regardless of
commit graph, works with a dirty working tree mid-session, and ignores
docs/tests/artifact churn — exactly the "does this certificate cover the
code that will run?" question. The commit sha is recorded alongside as
provenance (what history looked like at publish time), but sync is judged
on the tree hash alone.
"""

from __future__ import annotations

import hashlib
import os
import subprocess

_EXCLUDE_DIRS = {"__pycache__", ".pytest_cache"}
_EXCLUDE_SUFFIXES = (".pyc", ".pyo")


def _product_root() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def product_tree_hash(root: str | None = None) -> str:
    """Deterministic content hash of the product tree (``importer_spark/``
    by default): sha256 over the sorted ``relpath\\0file_sha256\\n``
    lines. Renames, adds, deletes, and edits all change it; mtime and
    permission churn do not."""
    root = root or _product_root()
    entries: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d not in _EXCLUDE_DIRS)
        for fname in sorted(filenames):
            if fname.endswith(_EXCLUDE_SUFFIXES):
                continue
            path = os.path.join(dirpath, fname)
            h = hashlib.sha256()
            with open(path, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            entries.append((os.path.relpath(path, root), h.hexdigest()))
    acc = hashlib.sha256()
    for rel, digest in sorted(entries):
        acc.update(rel.encode())
        acc.update(b"\0")
        acc.update(digest.encode())
        acc.update(b"\n")
    return acc.hexdigest()


def _git_head(repo_dir: str) -> str | None:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=repo_dir,
            capture_output=True,
            text=True,
            timeout=10,
        )
        return out.stdout.strip() or None if out.returncode == 0 else None
    except OSError:
        return None


def cert_stamp() -> dict:
    """The stamp every gate artifact embeds under its ``"cert"`` key:
    ``tree`` is the sync-enforced content hash, ``commit`` is provenance
    (HEAD at publish — the artifact is usually committed one commit LATER,
    so the tree hash, not the sha, is what the sync test compares),
    ``dirty`` flags a publish from an uncommitted working tree."""
    repo_dir = os.path.dirname(_product_root())
    commit = _git_head(repo_dir)
    dirty = None
    if commit is not None:
        try:
            st = subprocess.run(
                ["git", "status", "--porcelain", "--", "importer_spark"],
                cwd=repo_dir,
                capture_output=True,
                text=True,
                timeout=10,
            )
            if st.returncode == 0:
                dirty = bool(st.stdout.strip())
        except OSError:
            pass
    return {"tree": product_tree_hash(), "commit": commit, "dirty": dirty}
