"""Ship the crawld_spark package to executors.

On a real cluster the engine launches as ``spark-submit --py-files
crawld_spark.zip driver.py`` (north_star). When the package is instead
imported into an existing SparkSession (the graft driver, notebooks), the
executors' Python workers don't share the driver's sys.path — any pandas UDF
that closes over package code fails to unpickle with ModuleNotFoundError.
``ensure_shipped(spark)`` replicates --py-files after the fact: zip the
package once, ``sc.addPyFile`` it (idempotent per session).
"""

from __future__ import annotations

import os
import zipfile

_SHIPPED_ATTR = "_crawld_spark_shipped"


def build_pyfiles_zip(zip_path: str) -> str:
    """Package the crawld_spark source tree into a --py-files zip
    (deterministic member order)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.dirname(os.path.abspath(zip_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg_dir):
            dirs.sort()
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join("crawld_spark", os.path.relpath(full, pkg_dir))
                z.write(full, rel)
    return zip_path


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    zip_path = os.path.join("/tmp", f"crawld_spark_pyfiles_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        build_pyfiles_zip(zip_path)
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, True)


if __name__ == "__main__":
    # python -m crawld_spark.shiplib package dist/crawld_spark.zip
    import sys

    if len(sys.argv) >= 2 and sys.argv[1] == "package":
        out = sys.argv[2] if len(sys.argv) > 2 else "dist/crawld_spark.zip"
        print(build_pyfiles_zip(out))
    else:
        print("usage: python -m crawld_spark.shiplib package <out.zip>", file=sys.stderr)
        sys.exit(2)
