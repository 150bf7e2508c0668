"""Deterministic synthetic web generator (FIXTURES.md B1-B3, seed-driven).

Plays the role the GitHub API + git remotes play for the reference: the
simulated remote the engine crawls. Properties by design:

- **Zipf-ish host skew**: host h_i owns a share ~ 1/(i+1) of all pages —
  hot-host skew is required to exercise the salting path (SURVEY.md §4.2).
- **text-first**: ``text`` generated first from a seeded RNG; ``html`` is
  the deterministic wrapper (functions/extract.py) → the byte-identity gate
  has a ground truth.
- **seeded link graph**: page i links to pages chosen by a hash chain on
  (seed, i) — every run reproduces the same web, so the golden-trace
  simulator and the Spark engine crawl literally the same graph.
- generation itself is distributed: driver builds only the integer id range;
  rows materialize inside ``mapInPandas`` on executors (scales to any page
  count without driver memory).

Everything is derived from ``numpy.random.Generator(PCG64(seed + i))`` per
page — order- and partitioning-independent.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from crawld_spark.functions.extract import wrap_html_one

_WORDS = (
    "crawl frontier fetch page host link seed queue shard bloom cuckoo "
    "spark arrow batch merge round robot delay token hash text index "
    "graph node edge depth rank score fresh stale retry commit"
).split()

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

SEEDS_SCHEMA = StructType(
    [StructField("url", StringType(), False), StructField("priority", DoubleType(), False)]
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("disallow_prefixes", ArrayType(StringType()), True),
        StructField("crawl_delay_s", DoubleType(), True),
    ]
)

_LANGS = ["en", "de", "fr", "es", "it"]


def page_id_to_host(i: int, n_hosts: int) -> str:
    """Zipf-ish: page i belongs to host floor(sqrt applied over harmonic-ish
    buckets). Host 0 gets ~50% of pages, host 1 ~17%, ... (1/(k*(k+1)) + tail)."""
    # deterministic closed form: bucket by fractional part of harmonic share
    # share of host k  ∝ 1/((k+1)(k+2)); cumulative = 1 - 1/(k+2)
    # invert: k = floor(1/(1-frac)) - 2 clipped to [0, n_hosts-1]
    frac = (i * 2654435761 % 1000003) / 1000003.0
    k = int(1.0 / (1.0 - frac)) - 1 if frac < 1.0 else n_hosts - 1
    return f"host{min(max(k, 0), n_hosts - 1)}.example.com"


def page_url(i: int, n_hosts: int) -> str:
    return f"http://{page_id_to_host(i, n_hosts)}/p/{i}"


def _links_of(i: int, n_pages: int, n_hosts: int, seed: int, fanout: int) -> list[str]:
    rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
    k = int(rng.integers(0, fanout + 1))
    targets = rng.integers(0, n_pages, size=k)
    return [page_url(int(t), n_hosts) for t in targets]


def _text_of(i: int, seed: int) -> str:
    rng = np.random.Generator(np.random.PCG64(seed * 7_777_777 + i))
    n = int(rng.integers(20, 120))
    words = [_WORDS[int(w)] for w in rng.integers(0, len(_WORDS), size=n)]
    # sprinkle characters that stress the escape/unescape inverse
    if i % 7 == 0:
        words.append("<tag> & &amp; é中")
    return " ".join(words)


def _lang_of(i: int) -> str:
    return _LANGS[(i * 31) % len(_LANGS)]


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 16,
    seed: int = 42,
    fanout: int = 4,
    partitions: int = 32,
) -> DataFrame:
    """Distributed generation: spark.range → mapInPandas(materialize row)."""
    from crawld_spark.shiplib import ensure_shipped

    ensure_shipped(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = pd.Timestamp("2024-01-01", tz="UTC")
        for b in batches:
            ids = b["id"].to_numpy()
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for i in ids:
                i = int(i)
                url = page_url(i, n_hosts)
                text = _text_of(i, seed)
                links = _links_of(i, n_pages, n_hosts, seed, fanout)
                urls.append(url)
                tss.append(base + pd.Timedelta(seconds=i))
                htmls.append(wrap_html_one(url, text, links))
                texts.append(text)
                langs.append(_lang_of(i))
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
            )

    return (
        spark.range(0, n_pages, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def generate_seeds(spark: SparkSession, n_pages: int, n_hosts: int = 16,
                   n_seeds: int = 8, seed: int = 42) -> DataFrame:
    """Seed list (FIXTURES.md B2): first pages of the top hosts, fixed
    priorities — the fixed ordering that defines the golden crawl trace."""
    rng = np.random.Generator(np.random.PCG64(seed))
    ids = sorted(int(x) for x in rng.choice(n_pages, size=min(n_seeds, n_pages), replace=False))
    rows = [(page_url(i, n_hosts), float(100 - rank)) for rank, i in enumerate(ids)]
    from crawld_spark.session import local_df

    return local_df(spark, rows, SEEDS_SCHEMA, [f.name for f in SEEDS_SCHEMA.fields])


def generate_robots(spark: SparkSession, n_hosts: int = 16, seed: int = 42,
                    default_delay: float = 1.0) -> DataFrame:
    """Per-host rules (FIXTURES.md B3): every 5th host disallows /p/1 prefix
    pages; crawl delays vary deterministically."""
    rows = []
    for k in range(n_hosts):
        host = f"host{k}.example.com"
        disallow = ["/p/1"] if k % 5 == 3 else []
        delay = default_delay * (1 + (k % 3))
        rows.append((host, disallow, float(delay)))
    from crawld_spark.session import local_df

    return local_df(spark, rows, ROBOTS_SCHEMA, [f.name for f in ROBOTS_SCHEMA.fields])


def seeds_py(n_pages: int, n_hosts: int = 16, n_seeds: int = 8, seed: int = 42) -> list[tuple[str, float]]:
    """Driver-side (pure-Python) twin of generate_seeds for the simulator."""
    rng = np.random.Generator(np.random.PCG64(seed))
    ids = sorted(int(x) for x in rng.choice(n_pages, size=min(n_seeds, n_pages), replace=False))
    return [(page_url(i, n_hosts), float(100 - rank)) for rank, i in enumerate(ids)]


def robots_py(n_hosts: int = 16, default_delay: float = 1.0) -> dict[str, tuple[list[str], float]]:
    out = {}
    for k in range(n_hosts):
        host = f"host{k}.example.com"
        disallow = ["/p/1"] if k % 5 == 3 else []
        out[host] = (disallow, float(default_delay * (1 + (k % 3))))
    return out


def pages_py(n_pages: int, n_hosts: int = 16, seed: int = 42, fanout: int = 4) -> dict[str, dict]:
    """Pure-Python twin of generate_pages (small scales only) for the
    golden-trace simulator: url -> {text, links, lang}."""
    out = {}
    for i in range(n_pages):
        url = page_url(i, n_hosts)
        out[url] = {
            "text": _text_of(i, seed),
            "links": _links_of(i, n_pages, n_hosts, seed, fanout),
            "lang": _lang_of(i),
        }
    return out
