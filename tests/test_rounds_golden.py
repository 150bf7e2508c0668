"""Golden-trace e2e: the distributed engine must reproduce the pure-Python
reference simulator *exactly* — crawl ordering, discovery_seq assignment,
final seen set, frontier statuses, host clocks — under the same seed list and
politeness budget (north_rule; the crawld analog of its implicit
`ORDER BY id` ordering contract, /root/reference/crawld.go:275).

Also the byte-identity gate: every fetched text equals the source page text
byte-for-byte (input_hint), and full resumability (kill between rounds →
identical final state; ≙ crawld.go:412-421 last_fetched_id resume)."""

import pytest
from pyspark.sql import functions as F

from crawld_spark.config import CrawlConfig
from crawld_spark.plans.rounds import CrawlEngine
from crawld_spark.plans.simulator import simulate
from crawld_spark.sources.synth_web import (
    generate_pages,
    generate_robots,
    generate_seeds,
    pages_py,
    robots_py,
    seeds_py,
)

N_PAGES, N_HOSTS, SEED = 120, 8, 42


def mk_cfg(warehouse, **kw):
    base = dict(
        warehouse=warehouse,
        round_duration_s=10.0,
        default_crawl_delay_s=1.0,
        max_urls_per_host_per_round=8,
        n_seen_shards=4,
        cuckoo_capacity_per_shard=1 << 12,
        bloom_bits=1 << 14,
        shuffle_partitions=8,
        salt_buckets=4,
    )
    base.update(kw)
    return CrawlConfig(**base)


def build_engine(spark, warehouse, **kw):
    cfg = mk_cfg(warehouse, **kw)
    pages = generate_pages(spark, N_PAGES, N_HOSTS, SEED, fanout=3, partitions=4).cache()
    robots = generate_robots(spark, N_HOSTS, SEED)
    seeds = generate_seeds(spark, N_PAGES, N_HOSTS, n_seeds=5, seed=SEED)
    return CrawlEngine(spark, cfg, pages, robots), seeds, cfg


def sim_result(cfg, max_rounds=30):
    return simulate(
        pages_py(N_PAGES, N_HOSTS, SEED, fanout=3),
        seeds_py(N_PAGES, N_HOSTS, n_seeds=5, seed=SEED),
        robots_py(N_HOSTS, cfg.default_crawl_delay_s),
        cfg,
        max_rounds=max_rounds,
    )


def engine_trace(engine):
    rows = (
        engine.cat.read("fetched")
        .orderBy("round_id", F.desc("priority"), "discovery_seq")
        .select("round_id", "url")
        .collect()
    )
    out, cur_round, i = [], None, 0
    for r in rows:
        if r.round_id != cur_round:
            cur_round, i = r.round_id, 0
        out.append((r.round_id, i, r.url))
        i += 1
    return out


@pytest.mark.usefixtures("spark")
class TestGolden:
    def test_trace_and_state_match_simulator(self, spark, warehouse):
        engine, seeds, cfg = build_engine(spark, warehouse)
        engine.run(seeds, max_rounds=30)
        sim = sim_result(cfg)

        # 1. crawl ordering (round, seq, url) — exact
        assert engine_trace(engine) == sim.trace

        # 2. URL-seen set + discovery_seq assignment — exact
        fr = {
            r.url: (r.priority, r.discovery_seq, r.status)
            for r in engine.cat.read("frontier").collect()
        }
        sim_fr = {
            u: (row.priority, row.discovery_seq, row.status)
            for u, row in sim.frontier.items()
        }
        assert fr == sim_fr

        # 3. host clocks — exact float match (same arithmetic order)
        hs = {
            r.host: (r.next_allowed_vt, r.error_score)
            for r in engine.cat.read("host_state").collect()
        }
        sim_hs = {h: (s.next_allowed_vt, s.error_score) for h, s in sim.hosts.items()}
        assert hs == sim_hs

    def test_byte_identical_text(self, spark, warehouse):
        """input_hint: extracted text byte-identical per url vs source."""
        engine, seeds, cfg = build_engine(spark, warehouse)
        engine.run(seeds, max_rounds=30)
        joined = (
            engine.cat.read("fetched")
            .alias("f")
            .join(engine.pages.alias("p"), on="url")
            .select("url", F.col("f.text").alias("got"), F.col("p.text").alias("want"))
        )
        bad = joined.where(
            F.col("got").isNull() | (F.encode("got", "utf-8") != F.encode("want", "utf-8"))
        ).count()
        assert bad == 0
        assert joined.count() > 0

    def test_language_filter_path(self, spark, warehouse):
        """languages set → non-matching pages 'filtered', links not followed
        (≙ isLanguageWanted gating, crawlers/github.go:170-182)."""
        engine, seeds, cfg = build_engine(spark, warehouse, languages=["en", "de"])
        engine.run(seeds, max_rounds=30)
        sim = sim_result(cfg)
        fr = {r.url: r.status for r in engine.cat.read("frontier").collect()}
        sim_fr = {u: row.status for u, row in sim.frontier.items()}
        assert fr == sim_fr
        assert "filtered" in set(fr.values())
        assert engine_trace(engine) == sim.trace

    def test_robots_denial(self, spark, warehouse):
        engine, seeds, cfg = build_engine(spark, warehouse)
        engine.run(seeds, max_rounds=30)
        denied = (
            engine.cat.read("frontier").where(F.col("status") == "denied").collect()
        )
        # host3 disallows /p/1* (generate_robots: every 5th host, k%5==3)
        for r in denied:
            assert r.host == "host3.example.com" and "/p/1" in r.url

    def test_retry_lane_missing_pages(self, spark, warehouse):
        """Seeds pointing at nonexistent pages → retry-forever by default
        (≙ crawld.go:92-95), 'failed' when max_attempts set."""
        cfg = mk_cfg(warehouse, max_attempts=2)
        pages = generate_pages(spark, N_PAGES, N_HOSTS, SEED, fanout=3, partitions=4)
        robots = generate_robots(spark, N_HOSTS, SEED)
        seeds = spark.createDataFrame(
            [("http://host0.example.com/p/1", 100.0),
             ("http://nowhere.example.com/missing", 99.0)],
            "url string, priority double",
        )
        engine = CrawlEngine(spark, cfg, pages, robots)
        engine.run(seeds, max_rounds=8)
        row = [
            r for r in engine.cat.read("frontier").collect()
            if r.url == "http://nowhere.example.com/missing"
        ][0]
        assert row.status == "failed" and row.attempts == 2


@pytest.mark.usefixtures("spark")
class TestResume:
    def test_kill_and_resume_identical(self, spark, warehouse):
        """Run k rounds, 'crash', resume → final state identical to an
        uninterrupted run (SURVEY.md §5.2.5)."""
        engine, seeds, cfg = build_engine(spark, warehouse)
        engine.run(seeds, max_rounds=3)  # partial run, then new engine object
        engine2, _, _ = build_engine(spark, warehouse)
        engine2.run(None, max_rounds=30)  # resume: no seeds needed

        sim = sim_result(cfg)
        assert engine_trace(engine2) == sim.trace
        fr = {
            r.url: (r.priority, r.discovery_seq, r.status)
            for r in engine2.cat.read("frontier").collect()
        }
        assert fr == {
            u: (row.priority, row.discovery_seq, row.status)
            for u, row in sim.frontier.items()
        }

    def test_uncommitted_round_rolls_back(self, spark, warehouse):
        """Stage a round's writes without commit → resume ignores them
        (success-only checkpointing ≙ crawld.go:236-239)."""
        engine, seeds, cfg = build_engine(spark, warehouse)
        engine.run(seeds, max_rounds=2)
        frontier_before = sorted(
            (r.url, r.status) for r in engine.cat.read("frontier").collect()
        )
        # simulate crash mid-round-3: stage a bogus frontier version, advance
        # its pointer, but never commit
        bogus = engine.cat.read("frontier").limit(1)
        engine.cat.write("frontier", bogus, advance_pointer=True)
        engine2, _, _ = build_engine(spark, warehouse)
        assert engine2.cat.restore_last_commit() == 2
        frontier_after = sorted(
            (r.url, r.status) for r in engine2.cat.read("frontier").collect()
        )
        assert frontier_after == frontier_before


def _pages_df_from_py(spark, pages_dict):
    """Engine-side twin of a simulator pages dict, including the C7 error
    columns (http_status/err_msg) that trigger the reference's
    classification-by-substring (crawlers/github.go:1005-1026)."""
    import datetime as dt

    from crawld_spark.functions.extract import wrap_html_one

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    msg_of = {
        "too_many_calls": "GET /x: 403 API rate limit exceeded for 1.2.3.4",
        "unavailable": "GET /x: 403 Repository access blocked",
    }
    rows = []
    for i, (url, p) in enumerate(sorted(pages_dict.items())):
        err = p.get("error")
        rows.append(
            (
                url,
                base + dt.timedelta(seconds=i),
                wrap_html_one(url, p["text"], p["links"]),
                p["text"],
                p["lang"],
                403 if err else 200,
                msg_of.get(err),
                bool(p.get("fork", False)),
            )
        )
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string,"
        " http_status int, err_msg string, is_fork boolean",
    )


@pytest.mark.usefixtures("spark")
class TestLangTwoPhase:
    """F4 stage-2: case-SENSITIVE primary match, then case-INSENSITIVE
    fallback (≙ isLanguageWanted, crawlers/util.go:75-106; EqualFold :85)."""

    def test_fallback_admits_case_mismatch(self, spark, warehouse):
        # config says "En"/"De"; the web's langs are lowercase → every match
        # is a stage-2 (fallback) match
        engine, seeds, cfg = build_engine(spark, warehouse, languages=["En", "De"])
        engine.run(seeds, max_rounds=30)
        sim = sim_result(cfg)
        assert engine_trace(engine) == sim.trace
        fr = {r.url: r.status for r in engine.cat.read("frontier").collect()}
        assert fr == {u: row.status for u, row in sim.frontier.items()}
        fetched = engine.cat.read("fetched").collect()
        assert len(fetched) > 0
        assert {r.lang_stage for r in fetched} == {"fallback"}

    def test_fallback_off_filters(self, spark, warehouse):
        engine, seeds, cfg = build_engine(
            spark, warehouse, languages=["En", "De"], lang_ci_fallback=False
        )
        engine.run(seeds, max_rounds=30)
        sim = sim_result(cfg)
        assert engine_trace(engine) == sim.trace == []  # nothing passes stage 1
        fr = {r.url: r.status for r in engine.cat.read("frontier").collect()}
        assert fr == {u: row.status for u, row in sim.frontier.items()}
        assert "filtered" in set(fr.values())

    def test_primary_stage_marked(self, spark, warehouse):
        engine, seeds, cfg = build_engine(spark, warehouse, languages=["en", "de"])
        engine.run(seeds, max_rounds=30)
        fetched = engine.cat.read("fetched").collect()
        assert len(fetched) > 0
        assert {r.lang_stage for r in fetched} == {"primary"}


@pytest.mark.usefixtures("spark")
class TestFetchBudget:
    """F6 limit semantics: global (crawlers/github.go:121,128-129) vs
    per-language (crawlers/github.go:225,260-262; README.md:146-152)."""

    def test_global_limit(self, spark, warehouse):
        engine, seeds, cfg = build_engine(spark, warehouse, limit=7)
        engine.run(seeds, max_rounds=30)
        sim = sim_result(cfg)
        assert engine_trace(engine) == sim.trace
        n = engine.cat.read("fetched").count()
        assert n == len(sim.trace) <= 7
        fr = {r.url: r.status for r in engine.cat.read("frontier").collect()}
        assert fr == {u: row.status for u, row in sim.frontier.items()}

    def test_per_language_limit(self, spark, warehouse):
        engine, seeds, cfg = build_engine(
            spark, warehouse, limit=3, limit_per_language=True
        )
        engine.run(seeds, max_rounds=30)
        sim = sim_result(cfg)
        assert engine_trace(engine) == sim.trace
        by_lang = {
            r.lang: r.n
            for r in engine.cat.read("fetched")
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert by_lang and all(n <= 3 for n in by_lang.values())
        fr = {r.url: r.status for r in engine.cat.read("frontier").collect()}
        assert fr == {u: row.status for u, row in sim.frontier.items()}


@pytest.mark.usefixtures("spark")
class TestForkSkip:
    """F3: forks are skipped BEFORE the language filter unless keep_forks
    (≙ crawlers/github.go:166-168, ordering :166-182)."""

    def _dicts(self):
        d = pages_py(40, 4, SEED, fanout=2)
        for i, url in enumerate(sorted(d)):
            if i % 3 == 0:
                d[url] = dict(d[url], fork=True)
        return d

    def test_forks_filtered_golden(self, spark, warehouse):
        pages_dict = self._dicts()
        seeds_list = seeds_py(40, 4, n_seeds=6, seed=SEED)
        for keep in (False, True):
            wh = f"{warehouse}/k{int(keep)}"
            cfg = mk_cfg(wh, keep_forks=keep)
            engine = CrawlEngine(
                spark, cfg, _pages_df_from_py(spark, pages_dict),
                generate_robots(spark, 4, SEED),
            )
            engine.run(
                spark.createDataFrame(seeds_list, "url string, priority double"),
                max_rounds=12,
            )
            sim = simulate(pages_dict, seeds_list,
                           robots_py(4, cfg.default_crawl_delay_s), cfg, max_rounds=12)
            assert engine_trace(engine) == sim.trace, f"keep_forks={keep}"
            fr = {r.url: r.status for r in engine.cat.read("frontier").collect()}
            assert fr == {u: row.status for u, row in sim.frontier.items()}
            if not keep:
                assert "filtered" in set(fr.values())


@pytest.mark.usefixtures("spark")
class TestFailureLanes:
    """C7 taxonomy + the two failure lanes (crawld.go:92-104): network →
    retry next round; too_many_calls → rate-limit sleep; non-network update
    error → destroy + re-clone."""

    def _pages_dict(self, error_host=None, error=None):
        d = pages_py(40, 4, SEED, fanout=2)
        if error_host is not None:
            for url in d:
                if f"host{error_host}." in url:
                    d[url] = dict(d[url], error=error)
        return d

    def test_too_many_calls_golden(self, spark, warehouse):
        """Rate-limited host: engine's frontier/host clocks match the
        simulator exactly, and the taxonomy lands in lineage."""
        pages_dict = self._pages_dict(error_host=0, error="too_many_calls")
        pages = _pages_df_from_py(spark, pages_dict)
        cfg = mk_cfg(warehouse, rate_limit_wait_s=25.0, max_attempts=2)
        seeds = spark.createDataFrame(
            seeds_py(40, 4, n_seeds=5, seed=SEED), "url string, priority double"
        )
        engine = CrawlEngine(spark, cfg, pages, generate_robots(spark, 4, SEED))
        engine.run(seeds, max_rounds=12)
        sim = simulate(pages_dict, seeds_py(40, 4, n_seeds=5, seed=SEED),
                       robots_py(4, cfg.default_crawl_delay_s), cfg, max_rounds=12)
        assert engine_trace(engine) == sim.trace
        fr = {r.url: (r.status, r.attempts) for r in engine.cat.read("frontier").collect()}
        assert fr == {u: (row.status, row.attempts) for u, row in sim.frontier.items()}
        hs = {r.host: (r.next_allowed_vt, r.error_score)
              for r in engine.cat.read("host_state").collect()}
        assert hs == {h: (s.next_allowed_vt, s.error_score) for h, s in sim.hosts.items()}
        lineage = engine.cat.read("rounds")
        assert lineage.agg(F.sum("rate_limited")).collect()[0][0] > 0
        assert lineage.agg(F.sum("unavailable")).collect()[0][0] == 0

    def test_unavailable_clone_retries_golden(self, spark, warehouse):
        """'unavailable' on a first contact (clone) is NOT the re-clone lane
        — it retries like a network error (crawld.go:79-83 log-and-skip)."""
        pages_dict = self._pages_dict(error_host=1, error="unavailable")
        pages = _pages_df_from_py(spark, pages_dict)
        cfg = mk_cfg(warehouse, max_attempts=2)
        seeds = spark.createDataFrame(
            seeds_py(40, 4, n_seeds=5, seed=SEED), "url string, priority double"
        )
        engine = CrawlEngine(spark, cfg, pages, generate_robots(spark, 4, SEED))
        engine.run(seeds, max_rounds=12)
        sim = simulate(pages_dict, seeds_py(40, 4, n_seeds=5, seed=SEED),
                       robots_py(4, cfg.default_crawl_delay_s), cfg, max_rounds=12)
        assert engine_trace(engine) == sim.trace
        fr = {r.url: (r.status, r.attempts, r.last_round)
              for r in engine.cat.read("frontier").collect()}
        assert fr == {u: (row.status, row.attempts, row.last_round)
                      for u, row in sim.frontier.items()}
        assert engine.cat.read("rounds").agg(F.sum("unavailable")).collect()[0][0] > 0

    def test_failed_update_reenters_as_clone(self, spark, warehouse):
        """The destroy-and-re-clone lane (crawld.go:97-104): a non-network
        error on an UPDATE resets the row to first-contact state — the next
        successful fetch is a 'clone' again."""
        ok_dict = pages_py(20, 2, SEED, fanout=0)
        err_dict = {u: dict(p, error="unavailable") for u, p in ok_dict.items()}
        seeds = spark.createDataFrame(
            seeds_py(20, 2, n_seeds=3, seed=SEED), "url string, priority double"
        )
        kw = dict(
            round_duration_s=1e9, default_crawl_delay_s=0.0,
            max_urls_per_host_per_round=100, recrawl_after_rounds=1,
        )
        robots = generate_robots(spark, 2, SEED, 0.0)

        # round 1: healthy web → clone ok
        e1 = CrawlEngine(spark, mk_cfg(warehouse, **kw),
                         _pages_df_from_py(spark, ok_dict), robots)
        e1.run(seeds, max_rounds=1)
        # round 2: web turns 'unavailable' → update fails non-network
        e2 = CrawlEngine(spark, mk_cfg(warehouse, **kw),
                         _pages_df_from_py(spark, err_dict), robots)
        e2.run(None, max_rounds=1)
        fr = {r.url: r for r in e2.cat.read("frontier").collect()}
        seeded = [r for r in fr.values() if r.round_added == 0]
        assert seeded and all(
            r.status == "pending" and r.last_round is None and r.attempts == 0
            for r in seeded
        )
        # round 3: web healthy again → the re-fetch is a CLONE, not an update
        e3 = CrawlEngine(spark, mk_cfg(warehouse, **kw),
                         _pages_df_from_py(spark, ok_dict), robots)
        e3.run(None, max_rounds=1)
        r3 = [r for r in e3.cat.read("fetched").collect() if r.round_id == 3]
        assert r3 and all(r.fetch_kind == "clone" for r in r3)
        assert e3.cat.read("rounds").agg(F.sum("unavailable")).collect()[0][0] > 0


@pytest.mark.usefixtures("spark")
class TestRecrawl:
    """recrawl_after_rounds ≙ the reference's full re-fetch pass
    (crawld.go:109-249): previously-fetched URLs become eligible again after
    k rounds; first contact is a 'clone', every re-fetch an 'update' (F8,
    crawld.go:185-217)."""

    def test_refetch_after_k_rounds(self, spark, warehouse):
        pages = generate_pages(spark, 40, 4, seed=9, fanout=0, partitions=2).cache()
        seeds = generate_seeds(spark, 40, 4, n_seeds=4, seed=9)
        cfg = CrawlConfig(
            warehouse=warehouse,
            round_duration_s=1e9,
            default_crawl_delay_s=0.0,
            max_urls_per_host_per_round=100,
            n_seen_shards=4,
            bloom_bits=1 << 14,
            shuffle_partitions=4,
            salt_buckets=2,
            recrawl_after_rounds=2,
        )
        engine = CrawlEngine(spark, cfg, pages, generate_robots(spark, 4, 9, 0.0))
        stats = engine.run(seeds, max_rounds=5)
        # fanout=0: no links are ever admitted, so rounds continue ONLY via
        # recrawl. Round 1 fetches the seeds (clone); nothing is eligible
        # until round 3 (k=2), which run() fast-forwards to and re-fetches
        # everything (update).
        fetched = engine.cat.read("fetched").collect()
        kinds = {(r.round_id, r.fetch_kind) for r in fetched}
        assert (1, "clone") in kinds
        assert any(k == "update" for (_, k) in kinds), kinds
        # every re-fetch is byte-identical too
        rounds_seen = sorted({r.round_id for r in fetched})
        assert len(rounds_seen) >= 2
        # last_round tracks the latest successful fetch
        fr = {r.url: r for r in engine.cat.read("frontier").collect()}
        assert all(v.last_round == max(rd for rd, _ in kinds) or v.status != "fetched"
                   or v.last_round in {rd for rd, _ in kinds} for v in fr.values())

    def test_no_storage_leak_over_rounds(self, spark, warehouse):
        """Executor storage must not grow per round (r1 leaked one cached
        DataFrame per round via the admission chain): persistent-RDD count
        after 20 rounds ≈ after 5."""
        pages = generate_pages(spark, 400, 8, 42, fanout=3, partitions=4).cache()
        seeds = generate_seeds(spark, 400, 8, n_seeds=6, seed=42)
        cfg = mk_cfg(warehouse, recrawl_after_rounds=1, round_duration_s=20.0)
        engine = CrawlEngine(spark, cfg, pages, generate_robots(spark, 8, 42))

        def n_persist():
            return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

        engine.run(seeds, max_rounds=5)
        after5 = n_persist()
        engine.run(None, max_rounds=15)
        after20 = n_persist()
        pages.unpersist()
        assert after20 <= after5 + 3, (after5, after20)

    def test_no_recrawl_by_default_drains(self, spark, warehouse):
        pages = generate_pages(spark, 40, 4, seed=9, fanout=0, partitions=2).cache()
        seeds = generate_seeds(spark, 40, 4, n_seeds=4, seed=9)
        cfg = CrawlConfig(
            warehouse=warehouse,
            round_duration_s=1e9,
            default_crawl_delay_s=0.0,
            max_urls_per_host_per_round=100,
            n_seen_shards=4,
            bloom_bits=1 << 14,
            shuffle_partitions=4,
            salt_buckets=2,
        )
        engine = CrawlEngine(spark, cfg, pages, generate_robots(spark, 4, 9, 0.0))
        stats = engine.run(seeds, max_rounds=5)
        assert len(stats) == 1  # fanout=0, no recrawl → drains after round 1
        assert all(r.fetch_kind == "clone" for r in engine.cat.read("fetched").collect())


@pytest.mark.usefixtures("spark")
class TestRound4Hardening:
    """r4 items: per-language budget priors carried in memory, the pre-`h`
    warehouse compat shim, and the two-phase large-K round cut."""

    def test_per_language_budget_no_fetched_scan(self, spark, warehouse):
        """The per-lang budget prior must be carried in memory: one fetched
        table read on first use (resume), then ZERO reads in later budgeted
        rounds (VERDICT r3 'What's wrong #2') — while staying golden."""
        engine, seeds, cfg = build_engine(
            spark, warehouse, limit=3, limit_per_language=True
        )
        reads: list[str] = []
        orig = engine.cat.read

        def spy(name, *a, **kw):
            reads.append(name)
            return orig(name, *a, **kw)

        engine.cat.read = spy
        stats = engine.run(seeds, max_rounds=30)
        assert len(stats) >= 2  # multi-round run, or the assertion is vacuous
        assert reads.count("fetched") <= 1, reads
        sim = sim_result(cfg)
        assert engine_trace(engine) == sim.trace

    def test_old_warehouse_without_h_resumes(self, spark, warehouse):
        """A warehouse written before FRONTIER_SCHEMA gained `h` must resume:
        h backfilled as xxhash64(url) at read time, new deltas carry the
        column, and the crawl stays golden end-to-end (ADVICE r3)."""
        engine, seeds, cfg = build_engine(spark, warehouse)
        engine.run(seeds, max_rounds=2)
        # rewrite the frontier snapshot in the pre-r3 on-disk format
        cat = engine.cat
        old = cat.read("frontier").drop("h")
        v = cat.write("frontier", old, advance_pointer=False)
        versions = {
            t: cat.current_version(t)
            for t in ("frontier", "seen_shards", "host_state", "fetched",
                      "rounds", "robots")
        }
        versions["frontier"] = v
        cat.commit_round(2, versions)

        engine2, _, _ = build_engine(spark, warehouse)
        engine2.run(None, max_rounds=30)
        sim = sim_result(cfg)
        assert engine_trace(engine2) == sim.trace
        fr = {
            r.url: (r.priority, r.discovery_seq, r.status)
            for r in engine2.cat.read("frontier").collect()
        }
        assert fr == {
            u: (row.priority, row.discovery_seq, row.status)
            for u, row in sim.frontier.items()
        }
        # and the backfilled h is the canonical admission hash everywhere
        bad = (
            _backfill_h_import()(engine2.cat.read("frontier"))
            .where(F.col("h") != F.xxhash64("url"))
            .count()
        )
        assert bad == 0

    def test_large_round_cut_two_phase_golden(self, spark, warehouse):
        """With the two-phase rank cut forced on (threshold patched to 1),
        the round cut must reproduce the simulator trace exactly — same
        semantics as orderBy().limit(K), no single-task merge."""
        import crawld_spark.plans.rounds as rounds_mod

        old_thresh = rounds_mod.ROUND_CUT_TWO_PHASE_MIN
        rounds_mod.ROUND_CUT_TWO_PHASE_MIN = 1
        try:
            engine, seeds, cfg = build_engine(
                spark, warehouse, max_urls_per_round=6
            )
            engine.run(seeds, max_rounds=30)
            sim = sim_result(cfg)
            assert engine_trace(engine) == sim.trace
            fr = {r.url: r.status for r in engine.cat.read("frontier").collect()}
            assert fr == {u: row.status for u, row in sim.frontier.items()}
        finally:
            rounds_mod.ROUND_CUT_TWO_PHASE_MIN = old_thresh

    def test_small_round_cut_still_matches(self, spark, warehouse):
        """Control for the test above: the default (orderBy/limit) path at
        the same K produces the identical golden trace."""
        engine, seeds, cfg = build_engine(spark, warehouse, max_urls_per_round=6)
        engine.run(seeds, max_rounds=30)
        sim = sim_result(cfg)
        assert engine_trace(engine) == sim.trace


def _backfill_h_import():
    from crawld_spark.plans.rounds import _backfill_h

    return _backfill_h


@pytest.mark.usefixtures("spark")
class TestSignalPriority:
    """VERDICT r4 item 2: measured signals (PageRank × anchor counts ×
    freshness) drive the live round's (priority, discovery_seq) ordering —
    ≙ crawld's stars-ordering feeding the work list (crawlers/github.go:
    72-80 → crawld.go:275). The golden: a planted high-centrality URL is
    fetched AHEAD of seed/decay order, and the simulator reproduces the
    exact trace."""

    HUB = "http://hoste.test/z"

    def _world(self):
        # 4 seeds on 4 hosts; every seed page links the SAME hub url Z plus
        # one unique child — all five children live on ONE host E with a
        # per-host budget of 1, so round 2 fetches exactly one of them:
        # static order picks c1 (same priority as Z, earlier url), signal
        # order must pick Z (4 inbound links vs 1).
        pages = {}
        seeds = []
        for i in range(1, 5):
            su = f"http://host{i}.test/s{i}"
            pages[su] = {
                "text": f"seed page {i}",
                "links": [self.HUB, f"http://hoste.test/c{i}"],
                "lang": "en",
            }
            seeds.append((su, float(5 - i)))  # 4, 3, 2, 1
        pages[self.HUB] = {"text": "the hub", "links": [], "lang": "en"}
        for i in range(1, 5):
            pages[f"http://hoste.test/c{i}"] = {
                "text": f"child {i}", "links": [], "lang": "en",
            }
        return pages, seeds

    def _run(self, spark, warehouse, **kw):
        pages, seeds = self._world()
        cfg = mk_cfg(warehouse, max_urls_per_host_per_round=1, **kw)
        engine = CrawlEngine(
            spark, cfg, _pages_df_from_py(spark, pages),
            spark.createDataFrame(
                [], "host string, disallow_prefixes array<string>, crawl_delay_s double"
            ),
        )
        engine.run(
            spark.createDataFrame(seeds, "url string, priority double"),
            max_rounds=8,
        )
        sim = simulate(pages, seeds, {}, cfg, max_rounds=8)
        return engine, sim

    def test_planted_hub_jumps_the_queue(self, spark, warehouse):
        engine, sim = self._run(spark, warehouse, signal_priority_every=1)
        trace = engine_trace(engine)
        assert trace == sim.trace
        # round 2's single host-E slot goes to the hub, ahead of seed order
        r2 = [u for (r, _i, u) in trace if r == 2]
        assert r2 == [self.HUB]
        # and the persisted frontier carries the signal priority for Z:
        # rank_q·1 + 4 inlinks·1000 — strictly above any static priority
        fr = {
            r.url: (r.priority, r.status)
            for r in engine.cat.read("frontier").collect()
        }
        assert fr[self.HUB][1] == "fetched"
        assert fr[self.HUB][0] > 4000
        assert fr == {
            u: (row.priority, row.status) for u, row in sim.frontier.items()
        }

    def test_static_order_control(self, spark, warehouse):
        """Same world, signals OFF: static (priority, seq) order fetches c1
        first — proving the signal pass (not luck) reordered the queue."""
        engine, sim = self._run(spark, warehouse)  # signal_priority_every=0
        trace = engine_trace(engine)
        assert trace == sim.trace
        r2 = [u for (r, _i, u) in trace if r == 2]
        assert r2 == ["http://hoste.test/c1"]
