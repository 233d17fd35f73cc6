"""Build dist/table2qb_spark.zip for `spark-submit --py-files` (the north
rule's launch mode on a multi-executor cluster).

Usage:
    python tools/make_pyfiles_zip.py
    spark-submit --master <cluster> --py-files dist/table2qb_spark.zip \
        tools/spark_submit_launcher.py <task> [args...]

The zip contains only the package sources (no tests, no caches); the
launcher is shipped separately as the primary resource, exactly as a
cluster submission would do.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "table2qb_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "table2qb_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
