"""Physical-plan regression tests: the perf architecture is part of the
contract. Filters must reach the parquet scan, small dimensions must
broadcast, and the native scheduler must stay JVM-side (no Python eval in
its subplan). A change that silently de-optimizes these shapes fails here
long before a benchmark notices."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.usefixtures("spark")
class TestPlanShapes:
    def test_filter_pushdown_reaches_scan(self, spark):
        from crawld_spark.queries import queries

        df = queries()["frontier_scan_filter"](spark, SF)
        plan = _plan(df)
        assert "PushedFilters" in plan
        # the >= predicate must be pushed, not evaluated post-scan only
        assert "GreaterThanOrEqual(o_orderkey,1000)" in plan, plan

    def test_column_pruning(self, spark):
        df = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
        plan = _plan(df)
        assert "ReadSchema" in plan
        # only the selected column is read from parquet
        read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "o_orderkey" in read_schema and "o_totalprice" not in read_schema

    def test_small_dim_broadcasts(self, spark):
        from crawld_spark.queries import queries

        df = queries()["point_lookup_enrich"](spark, SF)
        assert "BroadcastHashJoin" in _plan(df)

    def test_native_scheduler_is_jvm_only(self, spark):
        from crawld_spark.config import CrawlConfig
        from crawld_spark.operators.politeness import HOST_STATE_SCHEMA, schedule_round

        pending = spark.createDataFrame(
            [(f"http://h{i % 5}.com/p/{i}", f"h{i % 5}.com", float(i % 7), i + 1)
             for i in range(100)],
            "url string, host string, priority double, discovery_seq long",
        )
        robots = spark.createDataFrame(
            [("h1.com", ["/p/1"], 2.0)],
            "host string, disallow_prefixes array<string>, crawl_delay_s double",
        )
        hs = spark.createDataFrame([], HOST_STATE_SCHEMA)
        cfg = CrawlConfig(max_urls_per_host_per_round=10).validate()
        plan = _plan(schedule_round(pending, hs, robots, 1, cfg))
        assert "Window" in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
            assert marker not in plan, f"python stage {marker} in scheduler plan"

    def test_rank_is_jvm_only(self, spark):
        from crawld_spark.plans.rank import global_rank

        df = spark.createDataFrame(
            [(f"u{i}", float(i % 3)) for i in range(50)], "url string, priority double"
        )
        ranked = global_rank(df, [F.desc("priority"), F.asc("url")], out="seq")
        plan = _plan(ranked)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, f"python stage {marker} in rank plan"

    def test_rank_width_follows_session(self, spark):
        """>64 partitions must survive (r1 capped at 64) and stay identical
        to the single-task window oracle."""
        from pyspark.sql.window import Window

        from crawld_spark.plans.rank import global_rank

        df = spark.range(0, 2000).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
            (F.col("id") % 7).cast("double").alias("priority"),
        )
        ranked = global_rank(
            df, [F.desc("priority"), F.asc("url")], out="seq", num_partitions=96
        )
        got = {r.url: r.seq for r in ranked.collect()}
        w = Window.orderBy(F.desc("priority"), F.asc("url"))
        want = {r.url: r.seq for r in df.withColumn("seq", F.row_number().over(w)).collect()}
        assert got == want

    def test_tier3_never_shuffles_frontier(self, spark):
        """The exact false-positive filter must consume the frontier through
        a map-side BroadcastHashJoin LeftSemi on the hash — the frontier
        branch must contain NO shuffle exchange. (At 10^10 frontier rows a
        per-round url-shuffle of the frontier is the admission scale-killer.)
        """
        from crawld_spark.operators.seen import exact_fp_filter

        suspects = spark.createDataFrame(
            [(f"http://h.com/{i}", 1.0) for i in range(20)],
            "url string, priority double",
        ).withColumn("h", F.xxhash64(F.col("url")))
        susp_h = suspects.select("h")
        frontier = spark.range(0, 5000).select(
            F.concat(F.lit("http://h.com/"), F.col("id").cast("string")).alias("url")
        )
        out = exact_fp_filter(suspects, susp_h, frontier)
        plan = _plan(out)
        semi = plan[plan.index("BroadcastHashJoin") :] if "BroadcastHashJoin" in plan else ""
        assert "BroadcastHashJoin" in plan, plan
        assert "LeftSemi" in semi, plan
        # the frontier subtree (below the semi-join) must be exchange-free
        assert "Exchange hashpartitioning(url" not in semi.split("LeftAnti")[-1], plan
        # semantics: frontier members are filtered out, true FPs survive
        fp = spark.createDataFrame(
            [("http://h.com/99999", 2.0)], "url string, priority double"
        ).withColumn("h", F.xxhash64(F.col("url")))
        fp = fp.select("url", "h", "priority")
        got = {
            r.url
            for r in exact_fp_filter(
                suspects.unionByName(fp), susp_h.unionByName(fp.select("h")), frontier
            ).collect()
        }
        assert got == {"http://h.com/99999"}

    def test_tier3_uses_stored_hash(self, spark, tmp_path):
        """With the frontier's persisted ``h`` column (FRONTIER_SCHEMA), the
        tier-3 pre-join must consume the stored 8-byte column: the frontier
        scan is pruned to [url, h] and NO xxhash64 recompute appears in the
        frontier branch of the semi-join."""
        from crawld_spark.operators.seen import exact_fp_filter

        p = str(tmp_path / "fr.parquet")
        spark.range(0, 2000).select(
            F.concat(F.lit("http://h.com/"), F.col("id").cast("string")).alias("url"),
            F.lit("pending").alias("status"),
            F.col("id").alias("round_added"),
        ).withColumn("h", F.xxhash64("url")).write.parquet(p)
        frontier = spark.read.parquet(p)
        suspects = spark.createDataFrame(
            [(f"http://h.com/{i}", 1.0) for i in range(10)]
            + [("http://h.com/99999", 2.0)],
            "url string, priority double",
        ).withColumn("h", F.xxhash64(F.col("url")))
        out = exact_fp_filter(suspects, suspects.select("h"), frontier)
        plan = _plan(out)
        i = plan.rindex("LeftSemi")
        j = plan.index("BroadcastExchange", i)
        frontier_branch = plan[i:j]
        assert "xxhash64" not in frontier_branch, plan
        # column pruning: the frontier scan reads only url + h
        read_schema = plan[i:].split("ReadSchema:")[1].splitlines()[0]
        assert "url" in read_schema and "h" in read_schema
        assert "status" not in read_schema and "round_added" not in read_schema
        # semantics unchanged: only the true FP survives
        assert {r.url for r in out.collect()} == {"http://h.com/99999"}

    def test_global_prefix_sum_no_single_partition(self, spark):
        """The fetch-budget prefix count must not collapse to one task: the
        plan may not contain a SinglePartition exchange (the r2 budget
        window did), and the values must equal the single-task window."""
        from pyspark.sql.window import Window

        from crawld_spark.plans.rank import global_prefix_sum

        df = spark.range(0, 3000).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
            (F.col("id") % 5).cast("double").alias("priority"),
            F.col("id").alias("discovery_seq"),
            (F.col("id") % 3 == 0).cast("int").alias("ok"),
        )
        order = [F.desc("priority"), F.asc("discovery_seq")]
        got_df = global_prefix_sum(df, order, F.col("ok"), out="cum", num_partitions=8)
        assert "SinglePartition" not in _plan(got_df), _plan(got_df)
        got = {r.url: r.cum for r in got_df.collect()}
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        want = {
            r.url: r.cum
            for r in df.withColumn("cum", F.sum("ok").over(w)).collect()
        }
        assert got == want

    def test_lookup_join_never_shuffles_big_side(self, spark):
        """The fetch join must consume the pages/frontier table through the
        broadcast semi-filter — the big side's subtree (below the LeftSemi)
        must contain no shuffle exchange."""
        from crawld_spark.plans.rounds import lookup_left_join

        small = spark.createDataFrame(
            [(f"u{i}", i) for i in range(10)] + [("missing", -1)],
            "url string, a int",
        )
        big = spark.range(0, 10000).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
            F.col("id").alias("b"),
        )
        out = lookup_left_join(small, big)
        plan = _plan(out)
        # the big-side subtree prints between the LeftSemi join and its
        # keys-side BroadcastExchange; only the round-sized key distinct may
        # shuffle (it prints after, under the BroadcastExchange)
        i = plan.rindex("LeftSemi")
        j = plan.index("BroadcastExchange", i)
        assert "Exchange" not in plan[i:j], plan
        got = {(r.url, r.b) for r in out.collect()}
        assert got == {(f"u{i}", i) for i in range(10)} | {("missing", None)}

    def test_mor_read_pushes_filter_to_base_scan(self, spark, warehouse):
        """A filter over a MOR table must reach the BASE parquet scan (the
        big side); the delta layers are bounded by compact_after."""
        from crawld_spark.sources.tables import Catalog

        cat = Catalog(spark, warehouse)
        base = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("pending").alias("status")
        )
        cat.write("t", base)
        upd = spark.range(0, 10).select(
            F.col("id").alias("k"), F.lit("fetched").alias("status")
        )
        cat.upsert("t", updates=upd, keys=["k"])
        df = cat.read("t").where(F.col("status") == "pending")
        plan = _plan(df)
        assert "PushedFilters" in plan
        assert "EqualTo(status,pending)" in plan, plan
        assert df.count() == 990

    def test_curation_pipeline_shape(self, spark):
        """The composed curation pass must keep its scale shape: every
        scoring/filter stage JVM-side (no Python eval anywhere in the
        plan), the benchmark-shingle set and the contaminated-id set
        broadcast (never shuffled against the corpus), and no shuffle
        keyed on raw text (dedup exchanges on md5(text), 16 bytes)."""
        from crawld_spark.queries import queries

        df = queries()["curation_pipeline"](spark, SF)
        plan = _plan(df)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
            assert marker not in plan, f"python stage {marker} in curation plan"
        # two broadcasts: bench shingles (left-semi) + contaminated ids (anti)
        assert plan.count("BroadcastExchange") >= 2, plan
        # every hash exchange keys on a hash/id/lang — never the text column
        for seg in plan.split("Exchange hashpartitioning(")[1:]:
            key = seg.split(",")[0].strip()
            # md5(text#N) is fine (16-byte key); bare text#N is not
            assert not key.startswith("text#"), f"raw text as shuffle key: {key}"


@pytest.mark.usefixtures("spark")
class TestWebtextPlanShapes:
    """r4 webtext lanes: the blocklist probe must stay K broadcast hash
    joins with zero corpus shuffle, and the LM lane's per-doc aggregate
    must partial map-side."""

    def test_blocklist_is_broadcast_probes_no_shuffle(self, spark):
        from crawld_spark.operators.urlfilter import blocklist_mark

        docs = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 7).cast("string"),
                     F.lit(".d"), (F.col("id") % 3).cast("string"),
                     F.lit(".example.com")).alias("host"),
        )
        bl = spark.createDataFrame(
            [("d1.example.com",), ("s2.d2.example.com",)], "entry string"
        )
        plan = _plan(blocklist_mark(docs, bl, max_labels=4))
        assert plan.count("BroadcastHashJoin") == 4, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        # the only shuffles are the blocklist's own distinct() (tiny side,
        # keyed _bl_entry): the corpus side must never exchange
        import re
        corpus_exchanges = [
            ln for ln in plan.splitlines()
            if re.search(r"\bExchange\b", ln)
            and "Broadcast" not in ln and "_bl_entry" not in ln
        ]
        assert not corpus_exchanges, corpus_exchanges

    def test_blocklist_suffix_semantics(self, spark):
        from crawld_spark.operators.urlfilter import blocklist_filter, blocklist_mark

        docs = spark.createDataFrame(
            [(1, "a.bad.com"), (2, "bad.com"), (3, "notbad.com"),
             (4, "deep.a.bad.com"), (5, "good.org")],
            "doc_id long, host string",
        )
        bl = spark.createDataFrame([("bad.com",)], "entry string")
        got = {r.doc_id: r.blocked for r in blocklist_mark(docs, bl).collect()}
        # suffix match at dot boundaries only: 'notbad.com' survives
        assert got == {1: True, 2: True, 3: False, 4: True, 5: False}
        kept = {r.doc_id for r in blocklist_filter(docs, bl).collect()}
        assert kept == {3, 5}

    def test_blocklist_host_deeper_than_max_labels(self, spark):
        """ADVICE r4 (high): the probe must check the SHORTEST suffixes, so
        a host with more labels than max_labels still matches its
        registrable-domain entry — no depth-based bypass."""
        from crawld_spark.operators.urlfilter import blocklist_mark

        docs = spark.createDataFrame(
            [(1, "a.b.c.d.e.f.bad.com"),      # 8 labels > max_labels=6
             (2, "a.b.c.d.e.f.good.com"),
             (3, "x.y.z.w.v.u.t.s.bad.com")],  # 10 labels
            "doc_id long, host string",
        )
        bl = spark.createDataFrame([("bad.com",)], "entry string")
        got = {r.doc_id: r.blocked for r in blocklist_mark(docs, bl).collect()}
        assert got == {1: True, 2: False, 3: True}

    def test_lm_scores_partial_agg_no_window(self, spark):
        from crawld_spark.operators.textstats import lm_bigram_scores

        docs = spark.createDataFrame(
            [(1, "the cat sat on the mat"), (2, "the cat ran")],
            "doc_id long, text string",
        )
        plan = _plan(lm_bigram_scores(docs))
        assert "Window" not in plan, plan
        # counts and the per-doc sum must combine map-side
        assert "partial_count" in plan or "partial" in plan.lower(), plan


@pytest.mark.usefixtures("spark")
class TestTrapAndBudget:
    """r5 crawl-scheduler lanes: trap detection must collapse before any
    shuffle, budget apportionment must be exact and window-free."""

    def test_url_template_collapse(self, spark):
        from crawld_spark.operators.urlfilter import url_template

        rows = spark.createDataFrame(
            [("/cal/2024/05/17",), ("/item?id=99",),
             ("/s/deadbeef01234567/x",), ("/plain/path",)],
            "path string",
        ).select(url_template(F.col("path")).alias("t")).collect()
        assert [r.t for r in rows] == [
            "/cal/~D/~D/~D", "/item?id=~D", "/s/~H/x", "/plain/path",
        ]

    def test_trap_stats_semantics(self, spark):
        from crawld_spark.operators.urlfilter import trap_stats

        # trap host: 60 urls, one '/d/~D' template; clean host: 60 urls,
        # 60 letter-only templates
        urls = spark.range(60).select(
            F.lit("trap.com").alias("host"),
            F.concat(F.lit("/d/"), F.col("id").cast("string")).alias("path"),
        ).unionAll(spark.range(60).select(
            F.lit("ok.com").alias("host"),
            F.concat(
                F.lit("/p/"),
                F.translate(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                    "0123456789", "ghijklmnop",
                ),
            ).alias("path"),
        ))
        got = {r.host: r for r in
               trap_stats(urls, min_urls=50, min_compression=10).collect()}
        t, ok = got["trap.com"], got["ok.com"]
        assert (t.n_urls, t.n_templates, t.is_trap) == (60, 1, True)
        assert t.compression_q == 60 and t.max_template_urls == 60
        assert ok.n_urls == 60 and ok.is_trap is False
        assert ok.compression_q == 1

    def test_trap_plan_two_partial_aggs_no_python(self, spark):
        from crawld_spark.operators.urlfilter import trap_stats

        urls = spark.range(100).select(
            F.lit("h").alias("host"), F.col("id").cast("string").alias("path")
        )
        plan = _plan(trap_stats(urls))
        assert "Window" not in plan, plan
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan, plan
        assert "partial" in plan.lower(), plan

    def test_budget_exact_and_proportional(self, spark):
        from crawld_spark.operators.budget import allocate_budget

        hosts = spark.createDataFrame(
            [("a", 5), ("b", 3), ("c", 2), ("d", 0)], "host string, mass long"
        )
        got = {r.host: r.alloc for r in
               allocate_budget(hosts, budget=100).collect()}
        assert got == {"a": 50, "b": 30, "c": 20, "d": 0}

    def test_budget_largest_remainder_ties(self, spark):
        from crawld_spark.operators.budget import allocate_budget

        # B=10, masses 1/1/1: base 3+3+3, leftover 1 goes to the smallest
        # host key (remainders all equal)
        hosts = spark.createDataFrame(
            [("x", 1), ("y", 1), ("z", 1)], "host string, mass long"
        )
        got = {r.host: r.alloc for r in
               allocate_budget(hosts, budget=10).collect()}
        assert got == {"x": 4, "y": 3, "z": 3}
        assert sum(got.values()) == 10

    def test_budget_zero_mass_total(self, spark):
        from crawld_spark.operators.budget import allocate_budget

        hosts = spark.createDataFrame(
            [("x", 0), ("y", 0)], "host string, mass long"
        )
        got = {r.host: r.alloc for r in
               allocate_budget(hosts, budget=10).collect()}
        assert got == {"x": 0, "y": 0}

    def test_budget_sum_invariant_random(self, spark):
        import random

        from crawld_spark.operators.budget import allocate_budget

        rng = random.Random(5)
        rows = [(f"h{i}", rng.randint(0, 1000)) for i in range(40)]
        hosts = spark.createDataFrame(rows, "host string, mass long")
        for b in (0, 1, 7, 999):
            got = allocate_budget(hosts, budget=b).agg(
                F.sum("alloc")).collect()[0][0]
            assert got == (b if sum(m for _, m in rows) > 0 else 0), b

    def test_budget_plan_no_global_window(self, spark):
        from crawld_spark.operators.budget import allocate_budget

        hosts = spark.createDataFrame(
            [("a", 5), ("b", 3)], "host string, mass long"
        )
        plan = _plan(allocate_budget(hosts, budget=100))
        # remainder ranking must ride the two-phase global_rank: the rank
        # column is assembled from the range-partition id + driver offset
        # map (_pid/_mid projection), and no window in the plan is a bare
        # global ORDER BY (any Window line must carry the _pid key)
        assert "_pid" in plan and "_mid" in plan, plan
        for ln in plan.splitlines():
            if "Window [" in ln:
                assert "_pid" in ln, ln


@pytest.mark.usefixtures("spark")
class TestSignalPlanPayloadFree:
    """VERDICT r5 item 1: the measured-signal pass must never move the
    html (or extracted text) payload through an exchange — links collapse
    as derived arrays, anchors are extracted executor-local per fetched
    row before the latest-round filter, and PageRank runs on xxhash64 ids.
    """

    def test_no_signal_exchange_carries_payload(self, spark, tmp_path):
        from crawld_spark.config import CrawlConfig
        from crawld_spark.plans.rounds import CrawlEngine
        from crawld_spark.sources.synth_web import (
            generate_pages,
            generate_robots,
            generate_seeds,
        )

        cfg = CrawlConfig(
            warehouse=str(tmp_path / "wh"), round_duration_s=30.0,
            max_urls_per_host_per_round=8, n_seen_shards=4,
            bloom_bits=1 << 14, shuffle_partitions=8, salt_buckets=4,
            signal_priority_every=1,
        )
        eng = CrawlEngine(
            spark, cfg,
            generate_pages(spark, 120, 6, 42, fanout=3, partitions=4).cache(),
            generate_robots(spark, 6, 42),
        )
        eng.run(generate_seeds(spark, 120, 6, n_seeds=4, seed=42), max_rounds=2)

        sig = eng._signal_priorities(3)
        txt = sig._sc._jvm.PythonSQLUtils.explainString(
            sig._jdf.queryExecution(), "formatted"
        )
        import re

        blocks = re.findall(
            r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", txt
        )
        assert blocks, txt  # the signal plan does shuffle SOMETHING
        for cols in blocks:
            assert "html" not in cols and "text#" not in cols, (cols, txt)
        # and it still computes: the composed priorities are non-empty
        assert sig.limit(1).count() == 1
