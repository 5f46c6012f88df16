"""Package the engine for ``spark-submit --py-files`` (BASELINE.json
north_star ship mechanism): one zip containing the ``table_ocr_spark``
package, importable on every executor.

Usage: python scripts/make_submit_zip.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "table_ocr_spark.zip")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "table_ocr_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
                n += 1
    print(f"{out}: {n} files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
