"""Build dist/pdf_parser_spark.zip for spark-submit --py-files.

The zip contains the pure-Python package (no tests, no caches); executors
unpack it onto sys.path. Usage::

    python jobs/package.py [dest_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(dest_dir: str | None = None) -> str:
    dest_dir = dest_dir or os.path.join(REPO, "dist")
    os.makedirs(dest_dir, exist_ok=True)
    out = os.path.join(dest_dir, "pdf_parser_spark.zip")
    pkg_root = os.path.join(REPO, "pdf_parser_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else None))
