"""Build the --py-files zip for spark-submit deployment.

Usage: python jobs/build_pyfiles.py [out.zip]
Packages the engine package (source only) into a single zip that
executors can import — the spark-submit shipping model named by the
north rule.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "open_bus_gtfs_etl_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "engine_pyfiles.zip")
    os.makedirs(os.path.dirname(target), exist_ok=True)
    print(build(target))
