"""Engine tests for the corpus-level rollups (operators/corpus.py) and the
inbound anchor-text aggregation (operators/graph.anchor_text_agg) — exact
handcrafted goldens, independent of the oracle lanes in queries.py."""

from pyspark.sql import functions as F

from crawld_spark.functions.extract import extract_anchors_one, wrap_html_one
from crawld_spark.operators import corpus
from crawld_spark.operators.graph import anchor_text_agg


class TestHostStats:
    def test_exact_rollup(self, spark):
        rows = [
            # host a: 4 docs, text "x" appears 3 times -> dup_docs 3, 2 langs
            (1, "x", "en", 10, "a"),
            (2, "x", "en", 20, "a"),
            (3, "x", "de", 30, "a"),
            (4, "y", "en", 40, "a"),
            # host b: 2 docs, no collisions -> dup_docs 0, 1 lang
            (5, "p", "en", 5, "b"),
            (6, "q", "en", 6, "b"),
        ]
        d = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, n_chars long, host string"
        )
        got = {
            r["host"]: r.asDict()
            for r in corpus.host_stats(d).collect()
        }
        assert got["a"] == {
            "host": "a", "n_docs": 4, "total_chars": 100,
            "dup_docs": 3, "n_langs": 2,
        }
        assert got["b"] == {
            "host": "b", "n_docs": 2, "total_chars": 11,
            "dup_docs": 0, "n_langs": 1,
        }

    def test_same_text_different_host_not_dup(self, spark):
        # within-host semantics: identical text on two hosts is NOT counted
        d = spark.createDataFrame(
            [(1, "x", "en", 1, "a"), (2, "x", "en", 1, "b")],
            "doc_id long, text string, lang string, n_chars long, host string",
        )
        assert all(
            r["dup_docs"] == 0 for r in corpus.host_stats(d).collect()
        )


class TestSnapshotDiff:
    def test_all_four_statuses(self, spark):
        old = spark.createDataFrame(
            [("u1", "d1"), ("u2", "d2"), ("u3", "d3")], "url string, dig string"
        )
        new = spark.createDataFrame(
            [("u1", "d1"), ("u2", "dX"), ("u4", "d4")], "url string, dig string"
        )
        got = {
            r["url"]: (r["status"], r["old_digest"], r["new_digest"])
            for r in corpus.snapshot_diff(old, new).collect()
        }
        assert got == {
            "u1": ("unchanged", "d1", "d1"),
            "u2": ("changed", "d2", "dX"),
            "u3": ("removed", "d3", None),
            "u4": ("added", None, "d4"),
        }


class TestAnchorText:
    def test_extract_anchors_unescapes(self):
        html = (
            b'<html><body><a href="http://a/1">A &amp; B</a>'
            b'<a href="http://a/2">plain</a></body></html>'
        )
        assert extract_anchors_one(html) == [
            "http://a/1\tA & B",
            "http://a/2\tplain",
        ]
        assert extract_anchors_one(None) is None

    def test_agg_counts_and_cap(self, spark):
        # wrap_html renders anchor i as l{i}; build 10 pages that all link
        # target T (10 distinct anchors l0..l9 via per-page position), plus
        # one page linking T twice (same src, n_inlinks +2 / n_srcs +1)
        pages = []
        for i in range(10):
            # pad with i unique-target links so T's anchor index varies
            links = [f"http://pad/{i}/{j}" for j in range(i)] + ["http://T/"]
            pages.append((i, wrap_html_one(f"http://src/{i}", "t", links)))
        pages.append((99, wrap_html_one("http://src/99", "t", ["http://T/"] * 2)))
        df = spark.createDataFrame(pages, "doc_id long, html binary")
        got = {
            r["target"]: r.asDict()
            for r in anchor_text_agg(df, max_anchors=8).collect()
        }
        t = got["http://T/"]
        assert t["n_inlinks"] == 12  # 10 pages + 1 page twice
        assert t["n_srcs"] == 11
        # distinct anchors are l0..l9 (page 99 re-adds l0/l1); sorted set
        # is l0,l1,...,l9 -> capped at 8 entries
        assert t["anchors_joined"] == "l0|l1|l2|l3|l4|l5|l6|l7"
        # a pad target has exactly one inlink
        assert got["http://pad/5/0"]["n_inlinks"] == 1


class TestBoilerplateStrip:
    """dedup.boilerplate_strip (oracled via the boilerplate_strip lane;
    these pin host-conditioning, the min_docs exemption, and reassembly)."""

    NAV = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one 8-word chunk

    def _md5(self, s):
        import hashlib

        return hashlib.md5(s.encode()).hexdigest()

    def test_strips_only_on_frequent_host(self, spark):
        from crawld_spark.operators.dedup import boilerplate_strip

        rows = [
            # host a: 4 docs, all share the nav chunk -> stripped
            *[(i, "a", f"{self.NAV} tail{i} x y z") for i in range(4)],
            # host b: ONE doc with the same nav chunk -> kept (host b has
            # fewer than min_docs docs; the chunk is frequent only on a)
            (10, "b", f"{self.NAV} solo"),
        ]
        d = spark.createDataFrame(rows, "doc_id long, host string, text string")
        got = {r.doc_id: r for r in boilerplate_strip(d).collect()}
        for i in range(4):
            assert got[i].n_chunks == 2 and got[i].n_boiler == 1
            assert got[i].clean_md5 == self._md5(f"tail{i} x y z")
        assert got[10].n_boiler == 0
        assert got[10].clean_md5 == self._md5(f"{self.NAV} solo")

    def test_min_docs_exemption_and_threshold(self, spark):
        from crawld_spark.operators.dedup import boilerplate_strip

        rows = [
            # host c: 2 identical docs — below min_docs=3, nothing stripped
            (0, "c", f"{self.NAV} same"),
            (1, "c", f"{self.NAV} same"),
            # host d: 4 docs, chunk shared by only 1 of 4 (< 1/2) -> kept
            (10, "d", f"{self.NAV} d0 q r s"),
            (11, "d", "other words here now d1 u v w"),
            (12, "d", "more unrelated text goes right here d2"),
            (13, "d", "final doc on host d with words d3"),
        ]
        d = spark.createDataFrame(rows, "doc_id long, host string, text string")
        got = {r.doc_id: r for r in boilerplate_strip(d).collect()}
        assert all(got[i].n_boiler == 0 for i in (0, 1, 10, 11, 12, 13))

    def test_everything_boiler_gives_empty_md5(self, spark):
        from crawld_spark.operators.dedup import boilerplate_strip

        rows = [(i, "e", self.NAV) for i in range(3)]
        d = spark.createDataFrame(rows, "doc_id long, host string, text string")
        got = boilerplate_strip(d).collect()
        assert all(r.n_boiler == 1 and r.clean_md5 == self._md5("") for r in got)


class TestMirrorHosts:
    def _pairs(self, spark, rows, **kw):
        d = spark.createDataFrame(rows, "host string, text string")
        return {
            (r.host_a, r.host_b): r.shared_digests
            for r in corpus.mirror_hosts(d, **kw).collect()
        }

    ROWS = [
        # a/b share two texts, a/b/c share one -> pairs (a,b)=2 (a,c)=1 (b,c)=1
        ("a", "m1"), ("b", "m1"), ("c", "m1"),
        ("a", "m2"), ("b", "m2"),
        ("d", "solo"),
        # viral text on 6 hosts: excluded by max_hosts_per_digest=4
        ("v0", "viral"), ("v1", "viral"), ("v2", "viral"),
        ("v3", "viral"), ("v4", "viral"), ("v5", "viral"),
    ]

    def test_planted_pairs_and_fanout_cap(self, spark):
        got = self._pairs(spark, self.ROWS, max_hosts_per_digest=4)
        assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}

    def test_min_shared_threshold(self, spark):
        got = self._pairs(spark, self.ROWS, min_shared=2, max_hosts_per_digest=4)
        assert got == {("a", "b"): 2}

    def test_within_host_duplicates_collapse(self, spark):
        # the same page crawled twice on one host is ONE (host, digest) row
        got = self._pairs(
            spark, self.ROWS + [("a", "m1"), ("a", "m1")],
            max_hosts_per_digest=4,
        )
        assert got[("a", "b")] == 2 and got[("a", "c")] == 1

    def test_uncapped_keeps_viral_digest(self, spark):
        got = self._pairs(spark, self.ROWS, max_hosts_per_digest=100)
        # 6 viral hosts -> C(6,2) = 15 extra pairs
        assert sum(1 for (x, _y) in got if x.startswith("v")) == 15


class TestHllDistinct:
    """operators/corpus.hll_distinct: deterministic integer HLL (oracled
    via the hll_host_distinct lane; these pin a pure-Python register
    replay, estimator accuracy in the raw-HLL zone, duplicate
    insensitivity, and the shuffle discipline)."""

    @staticmethod
    def _ref(pairs):
        """Pure-Python replay of the register tree + integer estimator."""
        import hashlib

        regs: dict = {}
        for key, val in pairs:
            v = int(hashlib.md5(val.encode()).hexdigest()[:15], 16)
            bucket, w = v % 16, v // 16
            rank = 40
            for r in range(1, 40):
                if w >= 1 << (56 - r):
                    rank = r
                    break
            k = (key, bucket)
            regs[k] = max(regs.get(k, 0), rank)
        out = {}
        for key in {k for k, _ in regs}:
            ms = [m for (k, _), m in regs.items() if k == key]
            z = sum(1 << (48 - m) for m in ms) + (16 - len(ms)) * (1 << 48)
            est = ((256 * (1 << 48)) // z) * 673 // 1000
            out[key] = (len(ms), z, est)
        return out

    def test_matches_python_replay(self, spark):
        pairs = [(f"h{i % 3}", f"/p/{i % 57}") for i in range(300)]
        df = spark.createDataFrame(pairs, "host string, url string")
        got = {
            r.key: (r.n_buckets_hit, r.z_scaled, r.est_q)
            for r in corpus.hll_distinct(df).collect()
        }
        assert got == self._ref(pairs)

    def test_duplicates_do_not_move_the_estimate(self, spark):
        base = [("h", f"/u/{i}") for i in range(100)]
        df1 = spark.createDataFrame(base, "host string, url string")
        df5 = spark.createDataFrame(base * 5, "host string, url string")
        e1 = corpus.hll_distinct(df1).collect()[0]
        e5 = corpus.hll_distinct(df5).collect()[0]
        assert (e1.z_scaled, e1.est_q) == (e5.z_scaled, e5.est_q)

    def test_accuracy_in_raw_zone(self, spark):
        # n = 500 distinct >> 2.5 * m = 40: raw HLL should land within
        # ~3 standard errors (1.04/sqrt(16) ~ 26% each)
        df = spark.createDataFrame(
            [("h", f"/u/{i}") for i in range(500)], "host string, url string"
        )
        est = corpus.hll_distinct(df).collect()[0].est_q
        assert 200 <= est <= 1000, est

    def test_plan_partial_agg_no_python_no_window(self, spark):
        df = spark.createDataFrame(
            [("h", "/u/1")], "host string, url string"
        )
        plan = (
            corpus.hll_distinct(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan, plan
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan, plan
        assert "partial" in plan.lower(), plan
        # the shuffle must key on (key, bucket) — never the value column
        for seg in plan.split("Exchange hashpartitioning(")[1:]:
            head = seg.split(")")[0]
            assert "url#" not in head, head


class TestCms:
    """operators/corpus.cms_cells / cms_estimate: Count-Min frequency
    sketch (oracled via the cms_heavy_hitters lane; these pin the
    pure-Python replay, the one-sided-error law, the bounded cell table,
    and exactness when nothing collides)."""

    @staticmethod
    def _py_cells(vals, width=64, d=4):
        import hashlib
        from collections import Counter

        cells: Counter = Counter()
        for v in vals:
            for k in range(d):
                h = int(
                    hashlib.md5(f"{k}#{v}".encode()).hexdigest()[:15], 16
                )
                cells[(k, h % width)] += 1
        return cells

    def _vals(self):
        # skewed: 'hot' 60x, ten warm keys 6x, forty cold keys once
        return (
            ["hot"] * 60
            + [f"w{i}" for i in range(10) for _ in range(6)]
            + [f"c{i}" for i in range(40)]
        )

    def test_cells_match_python_replay(self, spark):
        from crawld_spark.operators.corpus import cms_cells

        vals = self._vals()
        df = spark.createDataFrame([(v,) for v in vals], "host string")
        got = {
            (r.row, r.bucket): r.c for r in cms_cells(df, "host").collect()
        }
        want = dict(self._py_cells(vals))
        assert got == want
        # bounded: never more than d*width cells, total mass = d*n
        assert len(got) <= 4 * 64
        assert sum(got.values()) == 4 * len(vals)

    def test_one_sided_error_and_heavy_hitter(self, spark):
        from collections import Counter

        from crawld_spark.operators.corpus import cms_cells, cms_estimate

        vals = self._vals()
        exact = Counter(vals)
        df = spark.createDataFrame([(v,) for v in vals], "host string")
        keys = df.distinct()
        est = {
            r.key: r.est_q
            for r in cms_estimate(cms_cells(df, "host"), keys, "host").collect()
        }
        assert set(est) == set(exact)
        for k, n in exact.items():
            assert est[k] >= n, (k, est[k], n)  # never underestimates
        assert max(est, key=est.get) == "hot"

    def test_exact_when_no_collisions(self, spark):
        from crawld_spark.operators.corpus import cms_cells, cms_estimate

        # 3 keys in a 64-wide sketch: at least one of the 4 rows is
        # collision-free for every key with these md5s, so min == exact
        df = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "host string"
        )
        est = {
            r.key: r.est_q
            for r in cms_estimate(
                cms_cells(df, "host"), df.distinct(), "host"
            ).collect()
        }
        assert est == {"a": 5, "b": 3, "c": 1}

    def test_missing_key_estimates_zero_or_collision_mass(self, spark):
        from crawld_spark.operators.corpus import cms_cells, cms_estimate

        df = spark.createDataFrame([("a",)] * 4, "host string")
        keys = spark.createDataFrame([("never-seen",)], "host string")
        est = cms_estimate(cms_cells(df, "host"), keys, "host").collect()
        assert len(est) == 1 and 0 <= est[0].est_q <= 4

    def test_weighted_cells(self, spark):
        from pyspark.sql import functions as F

        from crawld_spark.operators.corpus import cms_cells, cms_estimate

        df = spark.createDataFrame(
            [("a", 10), ("a", 5), ("b", 2)], "host string, w long"
        )
        est = {
            r.key: r.est_q
            for r in cms_estimate(
                cms_cells(df, "host", weight_col="w"),
                df.select("host").distinct(),
                "host",
            ).collect()
        }
        assert est["a"] >= 15 and est["b"] >= 2

    def test_cell_build_is_one_partial_agg(self, spark):
        from crawld_spark.operators.corpus import cms_cells

        df = spark.createDataFrame([("a",)], "host string")
        plan = (
            cms_cells(df, "host")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "partial" in plan.lower(), plan
        # the exchange keys on (row, bucket), never the value column
        for seg in plan.split("Exchange hashpartitioning(")[1:]:
            head = seg.split(")")[0]
            assert "host#" not in head, head
