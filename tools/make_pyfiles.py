"""Package netascore_spark for ``spark-submit --py-files``.

Produces ``dist/netascore_spark.zip`` — the archive a cluster submit
ships to every executor (north-rule deployment path: ``spark-submit
--py-files dist/netascore_spark.zip jobs/score_network.py ...``).
Pure-python package, no binary deps, so one zip serves every executor
platform.

Usage: python tools/make_pyfiles.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(repo_root: str, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "netascore_spark.zip")
    pkg = os.path.join(repo_root, "netascore_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith((".py", ".yml")):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, repo_root))
        # the default mode profiles ride along so jobs can resolve them
        # without a shared filesystem
        prof = os.path.join(repo_root, "profiles")
        if os.path.isdir(prof):
            for f in sorted(os.listdir(prof)):
                if f.endswith(".yml"):
                    z.write(os.path.join(prof, f), os.path.join("profiles", f))
    return out


if __name__ == "__main__":
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, "dist")
    print(build(root, dest))
