#!/usr/bin/env python
"""Build the --py-files archive for cluster submission.

    python scripts/package.py [out.zip]
    spark-submit --py-files mysql_binlog_spark.zip scripts/replay.py ...

Zips the ``mysql_binlog_spark`` package only (no tests, no benches, no
fixtures cache) with deterministic member order and zeroed timestamps so
the archive hash is reproducible across builds — convenient for
cluster-side artifact caching.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "mysql_binlog_spark"


def build(out_path: str) -> int:
    members = []
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append((os.path.relpath(full, REPO), full))
    members.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in members:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    return len(members)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, f"{PKG}.zip"
    )
    n = build(out)
    print(f"{out}: {n} modules")
