"""Build the --py-files artifact for cluster submission.

The north-star deployment surface is `spark-submit --py-files
pyppeteer_scraper_spark.zip job.py` on a multi-executor cluster: the
zip must carry the whole package so BOTH the driver and every
executor's Python workers (pandas UDFs) can import it without any
repo checkout on the cluster nodes.

Usage: python tools/make_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "pyppeteer_scraper_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "pyppeteer_scraper_spark.zip"
    print(build(out))
