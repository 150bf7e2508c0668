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


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join("/tmp", f"crawld_spark_pyfiles_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "crawld_spark", os.path.relpath(full, pkg_dir)
                    )
                    z.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, True)
