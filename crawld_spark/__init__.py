"""crawld_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the *capabilities* of DevMine/crawld
(reference at /root/reference, Go) on idiomatic PySpark: DataFrame/SQL plans
optimized by Catalyst, row-level logic only in Arrow-vectorized pandas UDFs,
engine state in snapshot-versioned tables (Iceberg stand-in, see
``crawld_spark.sources.tables``), every crawl round an atomic, resumable
commit.

Subpackages
-----------
- ``config``     : job config + validation (≙ reference config/config.go)
- ``session``    : SparkSession builder with engine defaults
- ``sources``    : table catalog (snapshot/commit/merge) + synthetic web
- ``functions``  : URL canonicalization, HTML text/link extraction,
                   text-quality analytics, portable hashing
- ``operators``  : seen-set (bloom + cuckoo), politeness scheduler, merge
                   (upsert), top-k, dedup family, similarity search,
                   multimodal plumbing
- ``plans``      : the round driver (crawl loop) + pure-Python golden
                   simulator
- ``streaming``  : Structured-Streaming wrapper (one round = one micro-batch)
"""

__version__ = "0.1.0"
