#!/usr/bin/env python
"""spark-submit driver for the crawl engine (north_star launch shape):

    python -m crawld_spark.shiplib package dist/crawld_spark.zip
    spark-submit --py-files dist/crawld_spark.zip submit_main.py \
        --config job.json [--streaming] [--max-rounds N]

The config JSON holds a CrawlConfig (crawld_spark/config.py) plus the
job-level keys below — the same shape as the reference's crawld.conf
(/root/reference/config/config.go:27-150: one validated JSON config for both
subsystems):

  {
    "engine": { ...CrawlConfig fields... },
    "pages":  {"parquet": "/path/to/pages"}        # or {"synthetic": {...}}
    "robots": {"parquet": "/path/to/robots"},       # optional
    "seeds":  {"parquet": "/path/to/seeds"}         # or {"synthetic": true}
  }

Resume needs no seeds: a warehouse with a commit log continues after its
last committed round (≙ crawld's last_fetched_id read-back,
/root/reference/crawld.go:412-421).
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_df(spark, spec: dict, kind: str, synth_args: dict):
    from crawld_spark.sources import synth_web

    if "parquet" in spec:
        return spark.read.parquet(spec["parquet"])
    if "synthetic" in spec or spec.get("synthetic"):
        a = dict(synth_args)
        a.update(spec.get("synthetic") if isinstance(spec.get("synthetic"), dict) else {})
        if kind == "pages":
            return synth_web.generate_pages(
                spark, a.get("n_pages", 10000), a.get("n_hosts", 64),
                a.get("seed", 42), a.get("fanout", 4),
                a.get("partitions", 32),
            )
        if kind == "robots":
            return synth_web.generate_robots(spark, a.get("n_hosts", 64), a.get("seed", 42))
        if kind == "seeds":
            return synth_web.generate_seeds(
                spark, a.get("n_pages", 10000), a.get("n_hosts", 64),
                a.get("n_seeds", 64), a.get("seed", 42),
            )
    raise ValueError(f"{kind}: need 'parquet' or 'synthetic' in {spec}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="job config JSON path")
    p.add_argument("--max-rounds", type=int, default=1000)
    p.add_argument("--streaming", action="store_true",
                   help="drive rounds as Structured-Streaming micro-batches")
    args = p.parse_args(argv)

    with open(args.config) as f:
        job = json.load(f)

    from pyspark.sql import SparkSession

    from crawld_spark.config import CrawlConfig
    from crawld_spark.plans.rounds import CrawlEngine
    from crawld_spark.shiplib import ensure_shipped

    # under spark-submit the session (master, --py-files) comes from the
    # launcher; only engine-relevant SQL conf is set here
    cfg = CrawlConfig(**job.get("engine", {})).validate()
    spark = (
        SparkSession.builder.appName("crawld_spark")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        .getOrCreate()
    )
    ensure_shipped(spark)

    synth_defaults = job.get("synthetic_defaults", {})
    pages = _load_df(spark, job["pages"], "pages", synth_defaults)
    robots = (
        _load_df(spark, job["robots"], "robots", synth_defaults)
        if "robots" in job
        else None
    )
    seeds = (
        _load_df(spark, job["seeds"], "seeds", synth_defaults)
        if "seeds" in job
        else None
    )

    if args.streaming:
        from crawld_spark.streaming import StreamingCrawl

        sc = StreamingCrawl(spark, cfg, pages, robots)
        sc.start(seeds, max_rounds=args.max_rounds, available_now=True)
        stats = sc.round_stats
    else:
        engine = CrawlEngine(spark, cfg, pages, robots)
        stats = engine.run(seeds, max_rounds=args.max_rounds)

    for s in stats:
        print(json.dumps(s))
    print(json.dumps({"rounds_run": len(stats), "warehouse": cfg.warehouse}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
