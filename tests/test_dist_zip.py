"""Packaging freshness gate (ADVICE r07): dist/skyline_spark.zip is the
spark-submit --py-files artifact; a zip member whose bytes drift from
the working tree means the packaged engine silently runs stale code
(the r07 zip predated the streaming classify_anomalies twin). The gate
fails on ANY drift so 'refresh the zip' can never be claimed without
being true. Rebuild with scripts/scaling_bench.build_zip()."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP_PATH = os.path.join(REPO, "dist", "skyline_spark.zip")


def _tree_files() -> set[str]:
    out = set()
    pkg = os.path.join(REPO, "skyline_spark")
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                out.add(os.path.relpath(full, REPO))
    return out


def test_dist_zip_matches_working_tree():
    assert os.path.exists(ZIP_PATH), "dist/skyline_spark.zip missing"
    tree = _tree_files()
    with zipfile.ZipFile(ZIP_PATH) as z:
        members = {n for n in z.namelist() if n.endswith(".py")}
        missing = tree - members
        extra = members - tree
        assert not missing, f"zip is missing tree files: {sorted(missing)}"
        assert not extra, f"zip has files not in the tree: {sorted(extra)}"
        stale = []
        for name in sorted(members):
            with open(os.path.join(REPO, name), "rb") as fh:
                if z.read(name) != fh.read():
                    stale.append(name)
        assert not stale, (
            f"zip members differ from the working tree: {stale} — "
            "rebuild with scripts/scaling_bench.build_zip()")
