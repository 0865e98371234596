"""Build the spark-submit --py-files artifact (networkit_spark.zip).

North-rule delivery: ``spark-submit --py-files dist/networkit_spark.zip
your_job.py`` on a multi-executor cluster.  ``scripts/submit_smoke.py``
is a runnable job; smoke-run locally with:

    python scripts/package.py
    spark-submit --master 'local[8]' \\
        --py-files dist/networkit_spark.zip scripts/submit_smoke.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "networkit_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "networkit_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
