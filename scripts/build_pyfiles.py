"""Build the spark-submit --py-files archive for cluster shipping.

Zips the ``gluon_ocr_spark`` package (sources only) so the whole
engine ships as one artifact:

    spark-submit --master <cluster> \
        --py-files gluon_ocr_spark.zip \
        job.py --pages s3://lake/pages --out s3://lake/warehouse

Usage: python scripts/build_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg_dir = os.path.join(REPO, "gluon_ocr_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "gluon_ocr_spark.zip")
    print(build(out))
