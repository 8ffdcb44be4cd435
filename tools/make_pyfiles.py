"""Package the engine for cluster submission.

Builds ``dist/gdal_spark.zip`` — the ``--py-files`` artifact for the
north-rule deployment shape::

    spark-submit --py-files dist/gdal_spark.zip \\
        tools/run_pipeline.py --pages ... --out s3://...

The zip is deterministic (fixed timestamps, sorted entries) so
repeated builds of the same tree are byte-identical — same property
as the engine's other sinks, and what lets a deploy pipeline cache it
by content hash. Pure stdlib; excludes tests, caches, and bytecode.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "gdal_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    pkg_root = os.path.join(REPO, "gdal_spark")
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(
            d for d in dirnames if d != "__pycache__"
        )
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, REPO)
            entries.append((arc, full))
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, full in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    os.replace(tmp, out_path)
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
