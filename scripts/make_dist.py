"""Build the spark-submit --py-files artifact.

Usage: python scripts/make_dist.py [out_zip]
Produces dist/enhydris_autoprocess_spark.zip by default — submit with:

  spark-submit --py-files dist/enhydris_autoprocess_spark.zip \
      scripts/run_pipeline.py --config job.json \
      --input <transcripts parquet> --root <tier store root>

Deterministic: entries are sorted and timestamps zeroed so the same
tree always yields the same artifact (reproducible deploys).
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "enhydris_autoprocess_spark"


def build(out_path: str | None = None) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = out_path or os.path.join(repo, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    entries = []
    for base, dirs, files in os.walk(os.path.join(repo, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(base, f)
                entries.append((os.path.relpath(full, repo), full))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in sorted(entries):
            with open(full, "rb") as fh:
                info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                z.writestr(info, fh.read())
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
