"""Unit tests for the pure-function layer (mirrors the reference's only real
unit test, the language-filter table test at
/root/reference/crawlers/github_test.go:9-38, plus the byte-identity
invariant)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawld_spark.config import CrawlConfig, parse_duration
from crawld_spark.functions.extract import (
    extract_links_one,
    extract_text_one,
    wrap_html_one,
)
from crawld_spark.functions.hashing import md5_u64, splitmix64
from crawld_spark.functions.url import canonicalize_one, host_of


class TestCanonicalize:
    @pytest.mark.parametrize(
        "raw,expect",
        [
            ("HTTP://Host.Example.COM:80/p/1#frag", "http://host.example.com/p/1"),
            ("https://H.com:443", "https://h.com/"),
            ("h.com/x", "http://h.com/x"),
            ("h.com", "http://h.com/"),
            ("http://h.com/a?Q=Up#f", "http://h.com/a?Q=Up"),
            ("http://h.com:8080/x", "http://h.com:8080/x"),
            ("  http://h.com/  ", "http://h.com/"),  # trailing spaces inside path kept? no: strip is outer
            ("", None),
            (None, None),
        ],
    )
    def test_cases(self, raw, expect):
        assert canonicalize_one(raw) == expect

    def test_idempotent(self):
        for raw in ["HTTP://A.com/B#c", "x.com/y?z=1", "https://Q.com:443/r"]:
            once = canonicalize_one(raw)
            assert canonicalize_one(once) == once

    def test_host(self):
        assert host_of("http://a.b.c/d/e") == "a.b.c"
        assert host_of("http://a.b.c:8080/d") == "a.b.c:8080"
        assert host_of("http://a.b.c") == "a.b.c"


class TestSurtKey:
    """functions/url.surt_key: CDX reversed-host sort keys (r5). Pure
    column expression — one select, assertions on the literal outputs."""

    @pytest.mark.parametrize(
        "url,expect",
        [
            ("http://www.example.com/a/b?b=2&a=1", "com,example)/a/b?a=1&b=2"),
            ("https://sub.host3.example.com/p/9", "com,example,host3,sub)/p/9"),
            ("http://example.com/", "com,example)/"),
            ("http://www.example.com", "com,example)/"),  # canonical has no bare form, defensive
            ("http://h.com/x?single=1", "com,h)/x?single=1"),
        ],
    )
    def test_cases(self, spark, url, expect):
        from crawld_spark.functions.url import surt_key

        got = (
            spark.createDataFrame([(url,)], "url string")
            .select(surt_key(F.col("url")).alias("s"))
            .collect()[0]["s"]
        )
        assert got == expect

    def test_domain_range_contiguity(self, spark):
        """The property the CDX index buys: every capture under one
        registrable domain sorts into one contiguous key range."""
        from crawld_spark.functions.url import surt_key

        urls = [
            "http://a.example.com/1", "http://example.com/2",
            "http://z.example.com/3", "http://aaa.com/x", "http://zzz.org/y",
        ]
        rows = (
            spark.createDataFrame([(u,) for u in urls], "url string")
            .select("url", surt_key(F.col("url")).alias("s"))
            .collect()
        )
        ordered = [r.url for r in sorted(rows, key=lambda r: r.s)]
        ex_positions = [i for i, u in enumerate(ordered) if "example.com" in u]
        assert ex_positions == list(
            range(min(ex_positions), max(ex_positions) + 1)
        )


class TestTemperatureResample:
    def test_sqrt_quotas_exact(self, spark):
        """n = 100/25/4 per lang → isqrt weights 10/5/2 (tw 17); with
        total=34 the quotas are exactly 20/10/4 and each lang keeps
        min(quota, n) docs, chosen by md5-hash order."""
        from crawld_spark.operators.textstats import temperature_resample

        rows = (
            [(i, "a") for i in range(100)]
            + [(1000 + i, "b") for i in range(25)]
            + [(2000 + i, "c") for i in range(4)]
        )
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        got = temperature_resample(docs, total=34).collect()
        by_lang: dict = {}
        for r in got:
            by_lang.setdefault(r.lang, []).append(r)
        assert {l: len(v) for l, v in by_lang.items()} == {"a": 20, "b": 10, "c": 4}
        assert {r.quota for r in by_lang["a"]} == {20}
        # natural frequency is 100:25:4; sqrt-tempered is 20:10:4 — the
        # tail language's share tripled relative to the head's
        assert 20 / 4 < 100 / 4 / 2

    def test_deterministic(self, spark):
        from crawld_spark.operators.textstats import temperature_resample

        docs = spark.createDataFrame(
            [(i, "x" if i % 3 else "y") for i in range(60)],
            "doc_id long, lang string",
        )
        a = sorted((r.doc_id, r.lang) for r in temperature_resample(docs, 30).collect())
        b = sorted((r.doc_id, r.lang) for r in temperature_resample(docs, 30).collect())
        assert a == b and a


class TestExtraction:
    def test_roundtrip_simple(self):
        t = "hello world"
        h = wrap_html_one("http://x/", t, ["http://a/", "http://b/"])
        assert extract_text_one(h) == t
        assert extract_links_one(h) == ["http://a/", "http://b/"]

    def test_roundtrip_entities(self):
        # adversarial: text already containing entity-looking sequences
        for t in ["&amp;", "&lt;tag&gt;", "<a> & <b>", "&amp;lt;", "x &copy; y", "é中🎉"]:
            h = wrap_html_one("http://x/", t, [])
            assert extract_text_one(h) == t, t

    @given(st.text(max_size=400))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip_property(self, t):
        """escape/unescape must be a *byte-exact* inverse for any text —
        the input_hint invariant."""
        h = wrap_html_one("http://x/", t, ["http://l/1"])
        assert extract_text_one(h) == t
        assert extract_links_one(h) == ["http://l/1"]

    def test_none(self):
        assert extract_text_one(None) is None
        assert extract_links_one(None) is None


class TestHashing:
    def test_md5_u64_stable(self):
        assert md5_u64("http://a/") == md5_u64("http://a/")
        assert md5_u64("a") != md5_u64("b")

    def test_splitmix_vectorized(self):
        x = np.arange(100, dtype=np.uint64)
        y = splitmix64(x)
        assert len(set(y.tolist())) == 100


class TestConfig:
    def test_durations(self):
        assert parse_duration("12h") == 43200
        assert parse_duration("1h30m") == 5400
        assert parse_duration("1000ms") == 1.0
        with pytest.raises(ValueError):
            parse_duration("12x")

    def test_defaults_match_reference(self):
        # ≙ config/config.go:174-184 defaults
        c = CrawlConfig().validate()
        assert (c.throttler_wait_s, c.throttler_window, c.throttler_leak_s) == (1800.0, 60, 1.0)

    def test_defaulting_rules(self):
        c = CrawlConfig(max_workers=0, throttler_wait_s=-1).validate()
        assert c.max_workers == 1  # ≙ config/config.go:170-172
        assert c.throttler_wait_s == 1800.0

    def test_rejects(self):
        with pytest.raises(ValueError):
            CrawlConfig(n_seen_shards=3).validate()
        with pytest.raises(ValueError):
            CrawlConfig(round_duration_s=0).validate()
        with pytest.raises(ValueError):
            CrawlConfig.from_json('{"nope": 1}')


@pytest.mark.usefixtures("spark")
class TestSchedulerEquivalence:
    """The pure-Spark window scheduler and the applyInPandas heap scheduler
    must be row-identical on every input (same fetch set, same virtual
    times, same denied set)."""

    def test_native_equals_pandas(self, spark):
        from crawld_spark.operators.politeness import (
            HOST_STATE_SCHEMA,
            schedule_round,
            schedule_round_pandas,
        )

        rows = []
        seq = 0
        for h in range(6):
            host = f"host{h}.example.com"
            for i in range(40 if h == 0 else 7):  # host0 is hot
                seq += 1
                rows.append(
                    (f"http://{host}/p/{i}", host, float((i * 13) % 11), seq)
                )
        # bare-host URLs (no path): their path is '/', so a 'Disallow: /'
        # host must deny them in BOTH schedulers identically
        for h in (1, 4, 5):
            seq += 1
            rows.append((f"http://host{h}.example.com", f"host{h}.example.com",
                         5.0, seq))
        pending = spark.createDataFrame(
            rows, "url string, host string, priority double, discovery_seq long"
        )
        robots = spark.createDataFrame(
            [
                ("host1.example.com", ["/p/1", "/p/2"], 2.0),
                ("host3.example.com", [], 5.0),
                ("host5.example.com", ["/"], 1.0),  # deny-all incl. bare host
            ],
            "host string, disallow_prefixes array<string>, crawl_delay_s double",
        )
        host_state = spark.createDataFrame(
            [("host0.example.com", 95.0, 1.0, 0.0, 0.0)], HOST_STATE_SCHEMA
        )
        cfg = CrawlConfig(
            round_duration_s=30.0,
            default_crawl_delay_s=1.5,
            max_urls_per_host_per_round=10,
            salt_buckets=4,
        ).validate()

        def norm(df):
            return sorted(
                (
                    r.url, r.host, r.priority, r.discovery_seq, r.decision,
                    None if r.sched_vt is None else round(r.sched_vt, 9),
                    r.seq_in_host,
                )
                for r in df.collect()
            )

        for round_id in (1, 3):
            a = norm(schedule_round(pending, host_state, robots, round_id, cfg))
            b = norm(schedule_round_pandas(pending, host_state, robots, round_id, cfg))
            assert a == b, f"round {round_id}: native != pandas"
        assert len(norm(schedule_round(pending, host_state, robots, 1, cfg))) > 0


class TestRobotsParser:
    def test_basic_groups(self):
        from crawld_spark.functions.robots import parse_robots_one

        body = """
# comment
User-agent: *
Disallow: /private/
Disallow: /tmp
Crawl-delay: 2.5

User-agent: evilbot
Disallow: /
"""
        dis, delay = parse_robots_one(body, agent="crawld")
        assert dis == ["/private/", "/tmp"]
        assert delay == 2.5
        dis2, _ = parse_robots_one(body, agent="EvilBot")
        assert dis2 == ["/"]

    def test_specific_agent_beats_star(self):
        from crawld_spark.functions.robots import parse_robots_one

        body = "User-agent: *\nDisallow: /a\nUser-agent: crawld\nDisallow: /b\n"
        assert parse_robots_one(body, "crawld")[0] == ["/b"]
        assert parse_robots_one(body, "other")[0] == ["/a"]

    def test_empty_and_malformed(self):
        from crawld_spark.functions.robots import parse_robots_one

        assert parse_robots_one(None) == ([], None)
        assert parse_robots_one("") == ([], None)
        assert parse_robots_one("garbage without colon\n:\n") == ([], None)
        # empty Disallow value = allow all
        assert parse_robots_one("User-agent: *\nDisallow:\n") == ([], None)

    def test_shared_ua_lines_one_record(self):
        from crawld_spark.functions.robots import parse_robots_one

        body = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        assert parse_robots_one(body, "a")[0] == ["/x"]
        assert parse_robots_one(body, "b")[0] == ["/x"]

    def test_vectorized_udf(self, spark):
        from crawld_spark.functions.robots import robots_table

        df = spark.createDataFrame(
            [
                ("h1", "User-agent: *\nDisallow: /p/\nCrawl-delay: 3"),
                ("h2", ""),
                ("h3", None),
            ],
            "host string, body string",
        )
        out = {r.host: (r.disallow_prefixes, r.crawl_delay_s)
               for r in robots_table(df).collect()}
        assert out["h1"] == (["/p/"], 3.0)
        assert out["h2"] == ([], None)
        assert out["h3"] == ([], None)


class TestBpeTokenCount:
    """Rank-ordered BPE merge semantics (operators/textstats.BPE_MERGES is
    also rendered into the DuckDB oracle — these pin the Python reference)."""

    def test_merge_chain(self):
        from crawld_spark.operators.textstats import BPE_MERGES, bpe_token_count_word

        # t+h → th, th+e → the: one token
        assert bpe_token_count_word("the", BPE_MERGES) == 1
        # 'thee': the + e — 'the' exists, trailing e unmerged
        assert bpe_token_count_word("thee", BPE_MERGES) == 2
        assert bpe_token_count_word("", BPE_MERGES) == 0
        assert bpe_token_count_word("x", BPE_MERGES) == 1
        # no merge applies at all → one token per char
        assert bpe_token_count_word("zzz", BPE_MERGES) == 3

    def test_fixpoint_self_creating_merge(self):
        from crawld_spark.operators.textstats import bpe_token_count_word

        # merge (a, a) over a run: one replace pass pairs alternating
        # occurrences (the shared separator is consumed), the fixpoint
        # re-scan pairs the rest → aa|aa, never a|aaa and never aaaa
        # (pair (aa, aa) is a different, unlearned symbol pair)
        assert bpe_token_count_word("aaaa", [("a", "a")]) == 2
        assert bpe_token_count_word("aaa", [("a", "a")]) == 2  # aa + a
        # whole-symbol matching: 'aa'+'a' must NOT merge via the 'a' suffix
        assert bpe_token_count_word("aab", [("a", "a"), ("a", "b")]) == 2  # aa + b

    def test_rank_order_matters(self):
        from crawld_spark.operators.textstats import bpe_token_count_word

        # rank order (a,b) before (b,c): 'abc' → ab + c (b consumed first)
        assert bpe_token_count_word("abc", [("a", "b"), ("b", "c")]) == 2
        # reversed ranks: 'abc' → a + bc
        assert bpe_token_count_word("abc", [("b", "c"), ("a", "b")]) == 2
        # and the segmentations differ even when counts agree
        assert bpe_token_count_word("abcc", [("a", "b"), ("b", "c")]) == 3
        assert bpe_token_count_word("abcc", [("b", "c"), ("a", "b")]) == 3


class TestBpeBroadcastVocab:
    """r4: the production-size broadcast-vocab BPE path — rank-dict
    algorithm ≡ fixpoint algorithm, table validity, Spark equivalence."""

    def test_rankdict_equals_fixpoint_small_table(self):
        from crawld_spark.operators.textstats import (
            BPE_MERGES,
            bpe_token_count_word,
            bpe_token_count_word_ranked,
        )

        ranks = {p: r for r, p in enumerate(BPE_MERGES)}
        words = [
            "the", "thee", "theatre", "and", "standing", "x", "", "zzz",
            "aaaa", "ththth", "ingingin", "tand", "ofof", "attests",
            "internationalization", "anand", "erer", "thethethe",
        ]
        for w in words:
            assert bpe_token_count_word_ranked(w, ranks) == bpe_token_count_word(
                w, BPE_MERGES
            ), w

    def test_rankdict_equals_fixpoint_generated_table(self):
        """Equivalence holds on the md5-generated 2k-rank table too (it is
        valid by construction)."""
        from crawld_spark.operators.textstats import (
            bpe_token_count_word,
            bpe_token_count_word_ranked,
            generate_merge_table,
        )

        merges = generate_merge_table(2000)
        ranks = {p: r for r, p in enumerate(merges)}
        words = ["the", "anomaly", "androids", "ingesting", "qqqq", "a1b2c3",
                 "thethethe", "standardization", "0on0on", "erranderrand"]
        for w in words:
            assert bpe_token_count_word_ranked(w, ranks) == bpe_token_count_word(
                w, merges
            ), w

    def test_generated_table_valid_and_deterministic(self):
        from crawld_spark.operators.textstats import BPE_MERGES, generate_merge_table

        t1 = generate_merge_table(50_000)
        t2 = generate_merge_table(50_000)
        assert t1 == t2 and len(t1) == 50_000
        assert t1[: len(BPE_MERGES)] == BPE_MERGES  # real-English head kept
        # validity: every component is a single char or an earlier symbol
        import string

        symbols = set(string.ascii_lowercase) | set(string.digits)
        for x, y in t1:
            assert x in symbols and y in symbols, (x, y)
            symbols.add(x + y)
        assert len(set(t1)) == len(t1)  # no duplicate pairs

    def test_spark_broadcast_path_matches_closure_path(self, spark):
        """Over the real documents corpus: broadcast+rankdict ≡ the
        oracle-checked closure UDF for the same merge table."""
        from pyspark.sql import functions as F

        from crawld_spark.operators.textstats import (
            BPE_MERGES,
            token_count_bpe_broadcast,
            token_count_bpe_udf,
        )

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = d.select("doc_id", token_count_bpe_udf()(F.col("text")).alias("n"))
        b = d.select(
            "doc_id", token_count_bpe_broadcast(spark, BPE_MERGES)(F.col("text")).alias("n")
        )
        ga = {r.doc_id: r.n for r in a.collect()}
        gb = {r.doc_id: r.n for r in b.collect()}
        assert ga == gb and len(ga) > 0

    def test_spark_50k_vocab_runs(self, spark):
        """The 50k-rank table ships via sparkContext.broadcast and produces
        sane, deterministic counts (≤ the 20-merge table's counts: a
        superset vocab can only merge more)."""
        from pyspark.sql import functions as F

        from crawld_spark.operators.textstats import (
            BPE_MERGES,
            generate_merge_table,
            token_count_bpe_broadcast,
            token_count_bpe_udf,
        )

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
        big = generate_merge_table(50_000)
        got = {
            r.doc_id: r.n
            for r in d.select(
                "doc_id", token_count_bpe_broadcast(spark, big)(F.col("text")).alias("n")
            ).collect()
        }
        small = {
            r.doc_id: r.n
            for r in d.select(
                "doc_id", token_count_bpe_udf(BPE_MERGES)(F.col("text")).alias("n")
            ).collect()
        }
        assert got and all(0 < got[k] <= small[k] for k in got)


class TestWarcSource:
    """sources/warc.py: ISO 28500 framing, gzip members, failure lanes,
    and the distributed binaryFile→mapInPandas reader (the lane
    warc_roundtrip gates byte identity through the oracle)."""

    def _recs(self):
        import pandas as pd

        return [
            ("http://a.com/1", pd.Timestamp("2024-01-01T00:00:05Z"),
             b"<html>payload with \r\n\r\n tricky bytes</html>"),
            ("http://b.com/2", pd.Timestamp("2024-01-01T00:00:06Z"), b""),
            ("http://c.com/3", pd.Timestamp("2024-02-02T12:00:00Z"),
             b"WARC/1.0\r\nlooks-like-a-header: but is payload"),
        ]

    def test_roundtrip_bytes(self):
        from crawld_spark.sources.warc import parse_warc_bytes, warc_bytes_of

        recs = self._recs()
        got, skipped = parse_warc_bytes(warc_bytes_of(recs))
        assert skipped == 0
        assert [(r["url"], r["warc_ts"], r["html"]) for r in got] == recs

    def test_gzip_members(self):
        import gzip

        from crawld_spark.sources.warc import parse_warc_bytes, warc_bytes_of

        recs = self._recs()
        blob = b"".join(gzip.compress(warc_bytes_of([r])) for r in recs)
        got, skipped = parse_warc_bytes(blob)
        assert skipped == 0
        assert [r["html"] for r in got] == [r[2] for r in recs]

    def test_truncated_and_garbage(self):
        from crawld_spark.sources.warc import parse_warc_bytes, warc_bytes_of

        recs = self._recs()
        blob = warc_bytes_of(recs)
        got, skipped = parse_warc_bytes(blob[:-30])  # cuts into record 3
        assert len(got) == 2 and skipped == 1
        got2, skipped2 = parse_warc_bytes(b"HTTP nonsense, not WARC")
        assert got2 == [] and skipped2 == 1

    def test_non_response_records_skipped(self):
        from crawld_spark.sources.warc import parse_warc_bytes, warc_bytes_of

        recs = self._recs()
        blob = warc_bytes_of(recs[:1])
        info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"Content-Length: 4\r\n\r\nmeta\r\n\r\n")
        got, skipped = parse_warc_bytes(info + blob)
        assert len(got) == 1 and skipped == 1
        assert got[0]["url"] == "http://a.com/1"

    def test_read_warc_distributed(self, spark, tmp_path):
        import gzip

        from crawld_spark.sources.warc import read_warc, warc_bytes_of

        recs = self._recs()
        (tmp_path / "part-0.warc").write_bytes(warc_bytes_of(recs[:2]))
        (tmp_path / "part-1.warc.gz").write_bytes(
            gzip.compress(warc_bytes_of(recs[2:]))
        )
        got = {
            r.url: (r.warc_ts, bytes(r.html))
            for r in read_warc(spark, str(tmp_path)).collect()
        }
        assert set(got) == {u for u, _, _ in recs}
        for u, ts, html in recs:
            gts, ghtml = got[u]
            assert ghtml == html
            assert gts == ts.tz_localize(None)


class TestSitemapSource:
    """functions/sitemap.py: sitemaps.org parsing (the sitemap_roundtrip
    lane gates XML-hop identity; these pin index docs, malformed entries,
    escaping, and the distributed reader)."""

    def test_roundtrip_with_escaping(self):
        import pandas as pd

        from crawld_spark.functions.sitemap import (
            parse_sitemap_bytes,
            sitemap_xml_of,
        )

        xml = sitemap_xml_of(
            [
                ("http://a.com/p?x=1&y=2", "2024-03-01", 0.8),
                ("http://a.com/<odd>", None, None),
            ]
        )
        got, skipped = parse_sitemap_bytes(xml)
        assert skipped == 0
        assert got[0]["loc"] == "http://a.com/p?x=1&y=2"
        assert got[0]["lastmod"] == pd.Timestamp("2024-03-01")
        assert got[0]["priority"] == 0.8
        assert got[1]["loc"] == "http://a.com/<odd>"
        assert got[1]["lastmod"] is None and got[1]["priority"] is None

    def test_sitemapindex_and_skips(self):
        from crawld_spark.functions.sitemap import parse_sitemap_bytes

        idx = (
            b"<sitemapindex>"
            b"<sitemap><loc>http://a.com/s1.xml</loc></sitemap>"
            b"<sitemap></sitemap>"  # no loc -> skipped
            b"</sitemapindex>"
        )
        got, skipped = parse_sitemap_bytes(idx)
        assert len(got) == 1 and skipped == 1
        assert got[0]["is_index"] is True
        assert got[0]["loc"] == "http://a.com/s1.xml"

    def test_malformed_fields_tolerated(self):
        from crawld_spark.functions.sitemap import parse_sitemap_bytes

        bad = (
            b"<urlset><url><loc>http://x/</loc>"
            b"<lastmod>not-a-date</lastmod><priority>high</priority>"
            b"</url></urlset>"
        )
        got, skipped = parse_sitemap_bytes(bad)
        assert skipped == 0
        assert got[0]["lastmod"] is None and got[0]["priority"] is None

    def test_read_sitemaps_distributed(self, spark, tmp_path):
        from crawld_spark.functions.sitemap import (
            read_sitemaps,
            sitemap_xml_of,
        )

        (tmp_path / "s1.xml").write_bytes(
            sitemap_xml_of([("http://a.com/1", "2024-01-01", 0.5)])
        )
        (tmp_path / "s2.xml").write_bytes(
            sitemap_xml_of([("http://b.com/2", None, None)])
        )
        got = {r.loc: r for r in read_sitemaps(spark, str(tmp_path)).collect()}
        assert set(got) == {"http://a.com/1", "http://b.com/2"}
        assert got["http://a.com/1"].priority == 0.5
        assert got["http://b.com/2"].lastmod is None
        assert not any(r.is_index for r in got.values())


class TestBpeTrainer:
    """Corpus-trained BPE merges (textstats.train_bpe_merges): the Sennrich
    trainer on a word-frequency dict, deterministic tie-breaks, valid
    output that feeds the existing tokenizer paths."""

    def _corpus(self, spark):
        # the classic Sennrich example frequencies
        rows = (
            [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3
        )
        return spark.createDataFrame(rows, "text string")

    def test_learns_expected_merges(self, spark):
        from crawld_spark.operators.textstats import train_bpe_merges

        merges = train_bpe_merges(self._corpus(spark), n_merges=4)
        # pair counts round 1: (e,s)=9 ties (s,t)=9 -> lexicographic (e,s);
        # round 2: (es,t)=9; round 3: (l,o)=7 ties (o,w)=7 -> (l,o);
        # round 4: (lo,w)=7
        assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]

    def test_deterministic_and_valid(self, spark):
        from crawld_spark.operators.textstats import (
            bpe_token_count_word,
            train_bpe_merges,
        )

        docs = spark.createDataFrame(
            [(f"alpha beta gamma delta w{i % 7}",) for i in range(40)],
            "text string",
        )
        m1 = train_bpe_merges(docs, n_merges=12)
        m2 = train_bpe_merges(docs, n_merges=12)
        assert m1 == m2 and len(m1) == 12
        # validity: each merge's components are chars or earlier products
        symbols = set("abcdefghijklmnopqrstuvwxyz0123456789")
        for a, b in m1:
            assert a in symbols and b in symbols, (a, b)
            symbols.add(a + b)
        # trained table actually compresses the words it was trained on
        assert bpe_token_count_word("alpha", m1) < len("alpha")

    def test_feeds_broadcast_tokenizer(self, spark):
        from pyspark.sql import functions as F

        from crawld_spark.operators.textstats import (
            bpe_token_count_word,
            token_count_bpe_broadcast,
            train_bpe_merges,
        )

        docs = self._corpus(spark)
        merges = train_bpe_merges(docs, n_merges=4)
        udf = token_count_bpe_broadcast(spark, merges)
        got = {r.text: r.n for r in docs.distinct().select(
            "text", udf(F.col("text")).alias("n")).collect()}
        for w in ("low", "lower", "newest", "widest"):
            assert got[w] == bpe_token_count_word(w, merges), w

    def test_top_words_cap(self, spark):
        from crawld_spark.operators.textstats import train_bpe_merges

        # cap to the single most frequent word: merges learn only from it
        docs = self._corpus(spark)
        merges = train_bpe_merges(docs, n_merges=3, top_words=1)
        # 'newest' (6) wins the cap; all pair counts tie at 6 each round ->
        # lexicographic: (e,s) first, then (e,w), then (es,t)
        assert merges == [("e", "s"), ("e", "w"), ("es", "t")]


class TestRobotsRfc:
    """RFC 9309 robots semantics (functions/robots.py RFC family):
    Allow/Disallow + '*'/'$' wildcards, longest-pattern precedence with
    Allow winning ties; the JVM glob fold must agree verdict-for-verdict
    with the pure-Python twin and a regex reference, with no Python and
    no regex in the probe plan."""

    def test_compile_rule(self):
        from crawld_spark.functions.robots import _SENTINEL, _compile_rule

        r = _compile_rule("/*.php$", allow=False)
        assert r["segs"] == ["/", ".php" + _SENTINEL]
        assert r["spec"] == 7 and r["allow"] is False
        r = _compile_rule("/p/", allow=True)
        assert r["segs"] == ["/p/"] and r["spec"] == 3 and r["allow"]
        r = _compile_rule("*", allow=False)
        assert r["segs"] == ["", ""]

    def test_glob_matcher_vs_regex_reference(self):
        import re

        from crawld_spark.functions.robots import _compile_rule, match_glob_py

        patterns = [
            "/", "/p/", "/*.php$", "/p/*2", "/a*b*c", "/a*b*c$", "*",
            "/fish$", "/fish*$", "/p/**9", "/exact$", "$",
        ]
        paths = [
            "", "/", "/p/", "/p/1.php", "/p/10.php", "/p/3.php", "/fish",
            "/fishheads", "/p/92", "/a-b-c", "/a-b-c-d", "/axbxc",
            "/p/129", "/exact", "/exactly", "/p/2", "/abc",
        ]
        for pat in patterns:
            anchored = pat.endswith("$")
            core = pat[:-1] if anchored else pat
            rx = re.compile(
                "^" + ".*".join(re.escape(s) for s in core.split("*"))
                + ("$" if anchored else "")
            )
            segs = _compile_rule(pat, allow=False)["segs"]
            for path in paths:
                want = rx.search(path) is not None
                got = match_glob_py(path, segs)
                assert got == want, (pat, path, got, want)

    def test_parse_groups_and_precedence(self):
        from crawld_spark.functions.robots import parse_robots_rfc

        body = (
            "User-agent: *\nDisallow: /\nAllow: /p/\n\n"
            "User-agent: crawld\nDisallow: /*.html$\nCrawl-delay: 3\n"
        )
        rules, delay = parse_robots_rfc(body, agent="crawld-spark/1.0")
        assert len(rules) == 1 and delay == 3.0  # agent group wins
        rules, delay = parse_robots_rfc(body, agent="otherbot")
        assert len(rules) == 2 and delay is None
        # empty-value directives are no-ops; allow flag carried through
        rules, _ = parse_robots_rfc(
            "User-agent: *\nDisallow:\nAllow: /x\n", agent="*"
        )
        assert [(r["allow"]) for r in rules] == [True]

    def _verdict_py(self, rules, path):
        from crawld_spark.functions.robots import match_glob_py

        best = None
        for r in rules:
            if match_glob_py(path, r["segs"]):
                key = (r["spec"], 1 if r["allow"] else 0)
                best = key if best is None or key > best else best
        return best is not None and best[1] == 0

    def test_spark_verdict_matches_python(self, spark):
        from crawld_spark.functions.robots import (
            parse_robots_rfc,
            rfc_verdict,
            robots_rfc_table,
        )

        bodies = {
            "a": "User-agent: *\nDisallow: /*.php$\nAllow: /p/1*.php$\n",
            "b": "User-agent: *\nDisallow: /p/*2\n",
            "c": "User-agent: *\nDisallow: /\nAllow: /p/\nDisallow: /p/9*\n",
            "d": "User-agent: *\nDisallow: /\n\nUser-agent: crawld\nDisallow: /p/*.html$\n",
            "e": "User-agent: *\n",  # no rules at all
        }
        paths = [
            "/p/1.php", "/p/10.php", "/p/3.php", "/p/12", "/p/92",
            "/p/9", "/q/2", "/p/x.html", "/", "/p/", "/p/129.php",
        ]
        rb = spark.createDataFrame(
            list(bodies.items()), "host string, body string"
        )
        rules_df = robots_rfc_table(rb, agent="crawld-spark/1.0")
        urls = spark.createDataFrame(
            [(h, p) for h in bodies for p in paths], "host string, path string"
        )
        got = {
            (r.host, r.path): r.denied
            for r in urls.join(rules_df, "host")
            .select("host", "path", rfc_verdict("path", "rules").alias("denied"))
            .collect()
        }
        for h, body in bodies.items():
            rules, _ = parse_robots_rfc(body, agent="crawld-spark/1.0")
            for p in paths:
                assert got[(h, p)] == self._verdict_py(rules, p), (h, p)

    def test_verdict_plan_has_no_python(self, spark):
        from crawld_spark.functions.robots import rfc_verdict

        df = spark.createDataFrame(
            [("/p/1", [(["/p/"], 3, False)])],
            "path string, rules array<struct<segs:array<string>,spec:int,allow:boolean>>",
        )
        plan = (
            df.select(rfc_verdict("path", "rules").alias("denied"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PythonUDF" not in plan and "ArrowEval" not in plan, plan
        assert "RLike" not in plan and "regexp" not in plan.lower(), plan

    def test_null_and_empty_rules_allow(self, spark):
        from crawld_spark.functions.robots import rfc_verdict

        df = spark.createDataFrame(
            [("/x", None), ("/y", [])],
            "path string, rules array<struct<segs:array<string>,spec:int,allow:boolean>>",
        )
        rows = df.select("path", rfc_verdict("path", "rules").alias("d")).collect()
        assert all(not r.d for r in rows)


class TestRegistrableDomain:
    """functions/url.registrable_domain: PSL-style PLD extraction as a
    pure projection (oracled via pld_stats; these pin literal cases and
    the plan shape)."""

    def test_literal_cases(self, spark):
        from crawld_spark.functions.url import registrable_domain

        cases = {
            "www.example.com": "example.com",
            "a.b.c.example.com": "example.com",
            "example.com": "example.com",
            "x.shop.co.uk": "shop.co.uk",
            "shop.co.uk": "shop.co.uk",
            "co.uk": "co.uk",           # host IS a suffix -> itself
            "deep.a.gov.cn": "a.gov.cn",
            "localhost": "localhost",    # dotless -> itself
            "s1.com.au": "s1.com.au",
        }
        df = spark.createDataFrame([(h,) for h in cases], "host string")
        got = {
            r.host: r.pld
            for r in df.select(
                "host", registrable_domain("host").alias("pld")
            ).collect()
        }
        assert got == cases

    def test_custom_suffix_set(self, spark):
        from crawld_spark.functions.url import registrable_domain

        df = spark.createDataFrame([("x.y.custom.tld",)], "host string")
        pld = df.select(
            registrable_domain("host", multi_suffixes=("custom.tld",)).alias("p")
        ).collect()[0].p
        assert pld == "y.custom.tld"

    def test_is_pure_projection(self, spark):
        from crawld_spark.functions.url import registrable_domain

        df = spark.createDataFrame([("a.b.com",)], "host string")
        plan = (
            df.select(registrable_domain("host").alias("p"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "PythonUDF" not in plan, plan


@pytest.mark.usefixtures("spark")
class TestRfcSentinelSafety:
    """ADVICE r5: a hostile path CONTAINING the '$'-anchor sentinel byte
    must not forge an anchored match — rfc_verdict denies such paths
    outright (fail-safe over-deny)."""

    def test_sentinel_path_is_denied(self, spark):
        from crawld_spark.functions.robots import (
            _SENTINEL,
            parse_robots_rfc,
            rfc_verdict,
        )
        from crawld_spark.session import local_df

        body = "User-agent: *\nDisallow: /\nAllow: /public$\n"
        rules, _ = parse_robots_rfc(body, "crawld")
        rows = [
            ("/public", rules),                      # genuine anchored allow
            ("/public" + _SENTINEL + "secret", rules),  # forged anchor
            ("/private", rules),
        ]
        df = local_df(
            spark, rows,
            "path string, rules array<struct<segs:array<string>,spec:int,allow:boolean>>",
            ["path", "rules"],
        )
        got = {
            r["path"]: r["denied"]
            for r in df.select(
                "path", rfc_verdict("path", "rules").alias("denied")
            ).collect()
        }
        assert got["/public"] is False
        assert got["/public" + _SENTINEL + "secret"] is True
        assert got["/private"] is True
