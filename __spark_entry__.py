"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fetch-round-shaped pipeline on
/root/testdata/sf0.001; ``queries()`` / ``oracle_sql()`` expose the full
oracle-checked operator surface (crawld_spark.queries) covering SURVEY.md §2
plus the training-data pipeline operators (dedup / similarity / text
analysis / multimodal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the contract module may be imported from any CWD — make the package
# importable on the driver before anything else
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawld_spark import queries as _queries_mod
from crawld_spark.shiplib import ensure_shipped
from crawld_spark.functions.extract import extract_links, extract_text, wrap_html
from crawld_spark.functions.url import canonicalize_url, url_host


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one crawl fetch round, reshaped onto the sf0.001 corpus.

    documents play the simulated web (url derived from doc_id, html = the
    deterministic wrapper); a seed frontier selects, the "fetch" is the
    broadcast equi-join, extraction runs as vectorized pandas UDFs, and the
    result must round-trip text byte-identically (the input_hint invariant).
    """
    ensure_shipped(spark)  # executors need the package for the pandas UDFs
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    url = F.concat(F.lit("HTTP://Host"), (F.col("doc_id") % 7).cast("string"),
                   F.lit(".Example.COM/d/"), F.col("doc_id").cast("string"))
    links = F.array(
        F.concat(F.lit("http://host0.example.com/d/"),
                 ((F.col("doc_id") + 1) % 100).cast("string"))
    )
    pages = docs.select(
        canonicalize_url(url).alias("url"),
        wrap_html(canonicalize_url(url), F.col("text"), links).alias("html"),
        F.col("text"), F.col("lang"), F.col("doc_id"),
    )

    frontier = pages.select(
        "url",
        (F.col("doc_id") % 100).cast("double").alias("priority"),
    ).where(F.col("doc_id") < 200)

    fetched = (
        frontier.join(pages.select("url", "html", "lang", F.col("text").alias("src_text")),
                      on="url", how="left")
        .withColumn("text", extract_text(F.col("html")))
        .withColumn("links", extract_links(F.col("html")))
        .withColumn("host", url_host(F.col("url")))
        .withColumn("byte_identical", F.encode("text", "utf-8") == F.encode("src_text", "utf-8"))
    )
    return fetched.select(
        "url", "host", "priority", "lang",
        F.size("links").alias("n_links"), "byte_identical",
    )


def _shipping(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_shipped(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipping(fn) for name, fn in _queries_mod.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _queries_mod.oracle_sql()
