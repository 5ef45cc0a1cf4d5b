"""Package the library for spark-submit --py-files.

Creates a zip of the ``project_gutenberg_full_text_search_spark`` package that executors can
import, e.g.::

    python tools/make_pyfiles.py dist/pgfts.zip
    spark-submit --py-files dist/pgfts.zip tools/build_job.py \
        --input /data/source_code_table --index-dir /data/pgfts_index

Pure stdlib; no build backend needed (the sandbox constraint — and a
cluster edge node rarely has one either).
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "project_gutenberg_full_text_search_spark"


def make_pyfiles(out_path: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PKG)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for base, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in base:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(base, f)
                    z.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/pgfts.zip"
    print(make_pyfiles(out))
