#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline query surface at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the engine's own
headline metric from BASELINE.json: frontier-dedup + schedule throughput
(URLs/sec) on a deterministic synthetic frontier.

Prints exactly ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": <sf>, ...extras}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawld_spark.session import get_spark  # noqa: E402


# the queries worth timing at sf0.1: the crawl-shaped relational core plus
# every training-data-pipeline operator family (dedup / similarity / text).
# First 19 = the r1 headline (kept verbatim for round-over-round
# comparability); the tail = operators added in r2/r3 (VERDICT r2 item 10).
HEADLINE = [
    "frontier_scan_filter",
    "topk_per_group",
    "point_lookup_enrich",
    "link_if_absent",
    "merge_upsert",
    "seen_probe",
    "round_metrics",
    "fetch_order",
    "extract_text_roundtrip",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ngram_jaccard",
    "embedding_neardup",
    "ann_brute_topk",
    "lang_id",
    "quality_score",
    "token_counts",
    "fingerprint",
    # --- r2/r3 additions ---
    "srp_neardup",
    "ann_ivf_topk",
    "ann_ivf_kmeans",
    "dedup_clusters",
    "stratified_sample",
    "decontaminate",
    "dedup_simhash_bands",
    "token_counts_bpe",
    "multimodal_decode_roundtrip",
    # --- r4 additions ---
    "png_decode_roundtrip",
    "curation_pipeline",
    "quality_rules",
    "pii_scrub",
    "dedup_paragraphs",
    "lm_familiarity",
    "host_blocklist",
    "dedup_spans",
    "quality_classifier",
    "sequence_packing",
    "length_percentile_filter",
    "tfidf_top_terms",
    "materialize_sequences",
    "semantic_dedup",
    "warc_roundtrip",
    "pagerank",
    "recrawl_priority",
    "sitemap_roundtrip",
    "host_stats",
    "snapshot_diff",
    "anchor_text_agg",
    "ann_pq_adc",
    "ann_pq_rerank",
    "perplexity_buckets",
    "dedup_neardup_mark",
    "jpeg_decode_roundtrip",
    "boilerplate_strip",
    "decontaminate_fuzzy",
    "ann_ivf_pq",
    "sessionize",
    "session_window_agg",
    "zorder_key",
    "frontier_prioritize",
    "bm25_topk",
    # --- r5 additions ---
    "frame_sample",
    "surt_cdx_index",
    "temperature_resample",
    "mirror_hosts",
    "cdx_prefix_scan",
    "warc_to_wet",
    "robots_audit",
    "link_hits",
    "trap_stats",
    "budget_allocate",
    "hll_host_distinct",
    "shard_assign",
    "payload_type_stats",
    "cms_heavy_hitters",
    "robots_rfc_audit",
    "pld_stats",
]

# synthetic-frontier scale for the URLs/sec measurement; big enough that JVM
# fixed costs amortize, small enough for a per-round driver budget
CRAWL_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "60000"))
CRAWL_HOSTS = 64
CRAWL_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "4"))
CRAWL_SEEDS = int(os.environ.get("SPARK_GRAFT_BENCH_SEEDS", "2048"))

# frontier-dedup + schedule microbench (BASELINE.json headline metric):
# raw candidate URLs pushed through bloom→cuckoo admission + politeness
# scheduling in one wave — no fetch, pure frontier machinery
FRONTIER_URLS = int(os.environ.get("SPARK_GRAFT_BENCH_FRONTIER_URLS", "1000000"))
FRONTIER_HOSTS = 1024
FRONTIER_DUP_RATE = 0.3  # ~30% of raw candidates are duplicates
# waves > 1: run the whole frontier pipeline k times in this JVM (fresh
# warehouse each) and report the FASTEST wave — samples out within-JVM
# noise and cold-start (codegen compilation, Python worker spin-up), which
# is the honest steady-state number a long-running cluster job sees
FRONTIER_WAVES = int(os.environ.get("SPARK_GRAFT_BENCH_FRONTIER_WAVES", "1"))


def _frontier_throughput(spark, tag: str) -> dict:
    best = None
    for w in range(max(1, FRONTIER_WAVES)):
        r = _frontier_wave(spark, f"{tag}w{w}")
        if best is None or r["frontier_sec"] < best["frontier_sec"]:
            best = r
    best["frontier_waves"] = max(1, FRONTIER_WAVES)
    return best


def _frontier_wave(spark, tag: str) -> dict:
    """Measure dedup+schedule URLs/sec on FRONTIER_URLS raw candidates.

    The wave: JVM-generated candidate URLs (skewed hosts, ~30% dups) →
    groupBy(url) dedup → bloom/cuckoo admission (seen-set shards written) →
    per-host politeness schedule. Wall time covers the full pipeline
    including the seen-shards snapshot write.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from crawld_spark.config import CrawlConfig
    from crawld_spark.operators import politeness, seen
    from crawld_spark.plans.rank import global_rank
    from crawld_spark.sources.tables import Catalog

    n = FRONTIER_URLS
    uniq = int(n * (1.0 - FRONTIER_DUP_RATE))
    cfg = CrawlConfig(
        round_duration_s=1e9,
        default_crawl_delay_s=0.0,
        max_urls_per_host_per_round=1 << 20,
        n_seen_shards=32,
        bloom_bits=1 << 24,
        shuffle_partitions=int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    wh = tempfile.mkdtemp(prefix=f"bench_fr_{tag}_")
    try:
        cat = Catalog(spark, wh)
        # raw candidates, all JVM-side expressions (no Python in generation):
        # page id collides at rate FRONTIER_DUP_RATE; hosts skewed by pmod(xxhash64)
        raw = (
            spark.range(0, n, numPartitions=cfg.shuffle_partitions)
            .select(
                F.concat(
                    F.lit("http://bh"),
                    F.pmod(F.xxhash64((F.col("id") % uniq)), F.lit(FRONTIER_HOSTS)).cast("string"),
                    F.lit(".example.com/p/"),
                    (F.col("id") % uniq).cast("string"),
                ).alias("url"),
                (F.pmod(F.xxhash64("id"), F.lit(100)).cast("double")).alias("priority"),
            )
        )
        shards = seen.empty_shards(
            spark, cfg.n_seen_shards, 1 << 20, cfg.bloom_bits
        )
        empty_frontier = spark.createDataFrame([], "url string")
        robots = spark.createDataFrame(
            [], "host string, disallow_prefixes array<string>, crawl_delay_s double"
        )
        host_state = spark.createDataFrame([], politeness.HOST_STATE_SCHEMA)

        stage: dict[str, float] = {}
        t0 = t = time.perf_counter()

        def mark(name: str) -> None:
            nonlocal t
            now = time.perf_counter()
            stage[name] = round(now - t, 3)
            t = now

        cand = raw.groupBy("url").agg(F.max("priority").alias("priority"))
        admitted, dirty_shards, seen_caches = seen.admit_new_urls(
            spark, cand, shards, empty_frontier, cfg.n_seen_shards, 0
        )
        n_admitted = admitted.count()
        mark("dedup_admit")
        cat.upsert("seen_shards", updates=dirty_shards, keys=["shard_id"])
        mark("shards_write")
        ranked = global_rank(
            admitted.select("url", "priority"),
            [F.desc("priority"), F.asc("url")], out="discovery_seq", start=1,
            caches=seen_caches,
        )
        mark("rank")
        pending = ranked.withColumn(
            "host", F.regexp_extract("url", r"^https?://([^/]+)", 1)
        )
        scheduled = politeness.schedule_round(
            pending.select("url", "host", "priority", "discovery_seq"),
            host_state, robots, 1, cfg,
        )
        n_sched = scheduled.where(F.col("decision") == "fetch").count()
        mark("schedule")
        wall = time.perf_counter() - t0
        for df in (admitted, *seen_caches):
            seen.release_df(df)
        return {
            "frontier_raw_urls": n,
            "frontier_admitted": n_admitted,
            "frontier_scheduled": n_sched,
            "frontier_sec": round(wall, 3),
            "frontier_urls_per_sec": round(n / wall, 1) if wall > 0 else 0.0,
            "frontier_stages": stage,
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def _run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as contract

    qs = contract.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()  # full materialization of the plan
        out[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0
    return out


def _run_bpe_scale(spark, sf_dir: str) -> dict:
    """BPE throughput at a PRODUCTION vocab size (VERDICT r3 item 7): a
    deterministic 50k-rank merge table shipped via sparkContext.broadcast,
    rank-dict tokenization over the documents corpus. Reported as
    tokens/sec — the number a training-data pipeline budget actually uses
    (the oracle-checked 20-merge lane stays the correctness gate)."""
    from pyspark.sql import functions as F

    from crawld_spark.operators.textstats import (
        generate_merge_table,
        token_count_bpe_broadcast,
    )

    t0 = time.perf_counter()
    merges = generate_merge_table(50_000)
    gen_sec = time.perf_counter() - t0
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    udf = token_count_bpe_broadcast(spark, merges)
    t0 = time.perf_counter()
    row = d.select(
        F.sum(udf(F.col("text"))).alias("tok"), F.count("*").alias("docs")
    ).collect()[0]
    wall = time.perf_counter() - t0
    return {
        "bpe50k_vocab_gen_sec": round(gen_sec, 3),
        "bpe50k_sec": round(wall, 3),
        "bpe50k_docs": int(row.docs),
        "bpe50k_tokens": int(row.tok),
        "bpe50k_tokens_per_sec": round(row.tok / wall, 1) if wall > 0 else 0.0,
    }


def _run_crawl(spark, tag: str) -> dict:
    """One full synthetic crawl: bootstrap + CRAWL_ROUNDS fetch rounds.

    Throughput counts every URL that passed through dedup (bloom→cuckoo
    admission) + politeness scheduling, matching BASELINE.json's
    "frontier dedup + schedule throughput (URLs/sec)".
    """
    import shutil
    import tempfile

    from crawld_spark.config import CrawlConfig
    from crawld_spark.plans.rounds import CrawlEngine
    from crawld_spark.sources.synth_web import (
        generate_pages,
        generate_robots,
        generate_seeds,
    )

    wh = tempfile.mkdtemp(prefix=f"bench_wh_{tag}_")
    try:
        cfg = CrawlConfig(
            warehouse=wh,
            round_duration_s=1e9,  # politeness clock never binds: pure throughput
            default_crawl_delay_s=0.0,
            max_urls_per_host_per_round=100_000,
            n_seen_shards=32,
            bloom_bits=1 << 22,
            shuffle_partitions=int(spark.conf.get("spark.sql.shuffle.partitions")),
            salt_buckets=8,
        )
        pages = generate_pages(
            spark, CRAWL_PAGES, CRAWL_HOSTS, seed=42, fanout=4,
            partitions=cfg.shuffle_partitions,
        ).cache()
        pages.count()  # pre-materialize the simulated web outside the timer
        robots = generate_robots(spark, CRAWL_HOSTS, seed=42)
        seeds = generate_seeds(spark, CRAWL_PAGES, CRAWL_HOSTS, n_seeds=CRAWL_SEEDS, seed=42)
        eng = CrawlEngine(spark, cfg, pages, robots)
        t0 = time.perf_counter()
        stats = eng.run(seeds, max_rounds=CRAWL_ROUNDS)
        wall = time.perf_counter() - t0
        urls = sum(s["scheduled"] + s["admitted"] for s in stats)
        pages.unpersist()
        return {
            "crawl_sec": round(wall, 3),
            "crawl_rounds": len(stats),
            "crawl_urls": urls,
            "urls_per_sec": round(urls / wall, 1) if wall > 0 else 0.0,
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")  # "", "frontier", "crawl", "queries"
    try:
        queries = _run_queries(spark, sf_dir) if only in ("", "queries") else {}
        bpe = (
            _run_bpe_scale(spark, sf_dir)
            if only in ("", "queries")
            and os.environ.get("SPARK_GRAFT_BENCH_BPE", "1") != "0"
            else {}
        )
        crawl = (
            _run_crawl(spark, tag=cpus)
            if only in ("", "crawl")
            else {"crawl_sec": 0.0}
        )
        frontier = (
            _frontier_throughput(spark, tag=cpus)
            if only in ("", "frontier")
            else {"frontier_sec": 0.0}
        )
        total = round(
            sum(queries.values()) + crawl["crawl_sec"] + frontier["frontier_sec"], 3
        )
        result = {
            "metric": "headline queries + frontier dedup/schedule + crawl wall time",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "cpus": int(cpus),
            **crawl,
            **frontier,
            **bpe,
        }
        print(json.dumps(result))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
