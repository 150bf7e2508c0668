"""SparkSession builder with engine defaults.

Everything here is plain public PySpark configuration. AQE is on so skewed
shuffles (hot hosts) get runtime re-planning on top of our explicit salting
(SURVEY.md §4.2); Arrow is on because every row-level operator is a
vectorized pandas UDF (BASELINE.json input_hint: "no per-row Python").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawld_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # equi-joins on already-hashed keys (seen-set suspect joins, MOR
        # delta anti-joins) don't need a sort: prefer shuffled-hash when the
        # build side fits (AQE still upgrades small sides to broadcast)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # InferFiltersFromGenerate copies each explode's input expression
        # into a `size(e) > 0` filter and pushes it to the scan — for our
        # generated arrays (shingles, bigrams, chunk lists) that re-runs the
        # whole tokenize+shingle pipeline once more per row (measured: the
        # decontaminate lane spent >2× its wall in the inferred filter;
        # sf1.0 28.8 s → 2.9 s with the rule off). Every explode in this
        # engine feeds arrays that are ≥1 element by construction, so the
        # inferred filter never removes a row — semantics unchanged.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # ship this package to executors (≙ spark-submit --py-files): Python
    # workers don't inherit the driver's sys.path, and every engine UDF
    # closes over package code
    from crawld_spark.shiplib import ensure_shipped

    ensure_shipped(spark)
    if os.environ.get("SPARK_GRAFT_WARMUP", "1") != "0" and not getattr(
        spark, "_crawld_warmed", False
    ):
        _warm_session(spark)
        spark._crawld_warmed = True
    return spark


def local_df(spark: SparkSession, rows, schema, columns) -> "DataFrame":
    """Small driver-local row list → DataFrame via pandas + Arrow.

    The plain ``createDataFrame(list, schema)`` path parallelizes the rows
    through a Python RDD: every call forks ``defaultParallelism`` Python
    workers (measured: +32 resident workers per such lane, a fork storm
    that dominates small-lane wall under system load and leaks idle
    workers). The pandas + Arrow path builds the rows JVM-side with no
    Python workers at all. ``columns`` names the row fields for pandas;
    ``schema`` (DDL string or StructType) stays authoritative for types.
    """
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    pdf = pd.DataFrame([tuple(r) for r in rows], columns=list(columns), dtype=object)
    return spark.createDataFrame(pdf, schema=schema)


def _warm_session(spark: SparkSession) -> None:
    """One-time JVM/worker warmup on synthetic data (no input tables, no
    cached results): exercises whole-stage codegen, the shuffle machinery,
    the parquet writer+reader, and spawns the Python workers with a tiny
    pandas UDF across every core. Without it all of that lazy
    initialization lands on whichever real query runs first (~5-6 s on the
    first lane of a fresh session, measured at sf1.0). Disable with
    SPARK_GRAFT_WARMUP=0."""
    import shutil
    import tempfile

    import pandas as pd  # noqa: F401 — annotation namespace for the UDF
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    n = spark.sparkContext.defaultParallelism

    def _echo_fn(s):
        return s

    _echo_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _echo = F.pandas_udf(_echo_fn, LongType())

    df = spark.range(0, 1000 * n, numPartitions=n)
    (
        df.select(
            F.md5(F.col("id").cast("string")).alias("h"), _echo("id").alias("e")
        )
        .groupBy(F.substring("h", 1, 1))
        .count()
        .count()
    )

    # chained double-Python-eval pass: a task whose plan pipelines two
    # Python stages (mapInPandas feeding a pandas UDF — the multimodal
    # decode-roundtrip shape) holds TWO workers at once, so the first such
    # real query otherwise forks a second full worker set mid-benchmark
    def _ident(it):
        yield from it

    (
        df.mapInPandas(_ident, "id long")
        .select(_echo("id").alias("e"))
        .agg(F.count("e"))
        .collect()
    )
    d = tempfile.mkdtemp(prefix="spark_warm_")
    try:
        df.limit(64).write.mode("overwrite").parquet(os.path.join(d, "p"))
        spark.read.parquet(os.path.join(d, "p")).count()
    finally:
        shutil.rmtree(d, ignore_errors=True)
