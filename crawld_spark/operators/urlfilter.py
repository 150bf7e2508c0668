"""Domain-blocklist filtering (UT1/adult-list style): a listed domain
blocks itself and every subdomain (suffix match at dot boundaries).

Reference parity: crawld filters URLs against per-crawler allow/deny host
rules before admission (config-driven; cf. crawld.go fetch-loop admission
and SURVEY.md §2 F-filters); this operator is the corpus-curation twin —
the web-pipeline pass that drops documents whose host sits under a listed
domain (UT1 blocklists, spam/adult domain lists).

Scale shape (100 TB, blocklist ~3M entries ≈ the real UT1): the naive
forms all fail —
- a regex/LIKE per entry is O(rows × entries) scans;
- ``array_contains(suffixes, entry)`` against a broadcast table is a
  BroadcastNestedLoopJoin (same O(rows × entries));
- explode(suffixes) + hash-join + groupBy(doc) re-shuffles the corpus.
Instead: a hostname has a *bounded* label depth (≤ ``max_labels``), so the
per-row decision is at most ``max_labels`` equality probes — K chained
BroadcastHashJoins on the same broadcast blocklist, one per suffix depth,
OR-ed into one flag. Zero shuffle of the corpus, no row explosion, no
Python; each probe is a codegen hash lookup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_suffixes(host: Column, max_labels: int | None = None) -> Column:
    """All dot-boundary suffixes of a hostname:
    ``'a.b.c' -> ['a.b.c', 'b.c', 'c']`` (optionally capped to the last
    ``max_labels`` labels). Pure array expression."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    lo = F.lit(1) if max_labels is None else F.greatest(F.lit(1), n - (max_labels - 1))
    return F.transform(
        F.sequence(lo, n), lambda i: F.array_join(F.slice(parts, i, n), ".")
    )


def blocklist_mark(
    docs: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    entry_col: str = "entry",
    max_labels: int = 6,
) -> DataFrame:
    """Append a ``blocked`` boolean: true iff any dot-boundary suffix of
    ``host_col`` equals a blocklist entry. Implemented as ``max_labels``
    chained broadcast hash joins (see module docstring for why this is the
    only shape that is simultaneously sub-O(rows×entries), shuffle-free,
    and JVM-only). Probes the SHORTEST ``max_labels`` suffixes (the last
    1..max_labels labels), so a host of any depth always has its
    registrable-domain suffix checked — real blocklists list registrable
    domains (2-4 labels), so entries deeper than ``max_labels`` labels are
    the only thing the cap can miss."""
    bl = F.broadcast(
        blocklist.select(F.col(entry_col).alias("_bl_entry")).distinct()
    )
    out = docs.withColumn("_parts", F.split(F.col(host_col), r"\."))
    hit_cols: list[str] = []
    for i in range(max_labels):
        sfx = F.when(
            F.size("_parts") > i,
            F.array_join(F.slice(F.col("_parts"), -(i + 1), i + 1), "."),
        )
        hit = f"_bl_hit_{i}"
        out = out.join(
            bl.withColumnRenamed("_bl_entry", hit),
            on=sfx == F.col(hit),
            how="left",
        )
        hit_cols.append(hit)
    blocked = F.coalesce(*[F.col(h) for h in hit_cols]).isNotNull()
    return out.withColumn("blocked", blocked).drop("_parts", *hit_cols)


def blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    entry_col: str = "entry",
    max_labels: int = 6,
) -> DataFrame:
    """Drop rows whose host sits under a blocklisted domain (the curation
    pass itself)."""
    marked = blocklist_mark(docs, blocklist, host_col, entry_col, max_labels)
    return marked.where(~F.col("blocked")).drop("blocked")


def url_template(path: Column) -> Column:
    """Collapse a URL path to its structural template: hex runs of 8+
    chars become ``~H`` (session ids, UUIDs, content hashes), then any
    remaining digit run becomes ``~D`` (ids, dates, page numbers).
    Pure JVM regexp — codegen, no shuffle, no Python."""
    t = F.regexp_replace(path, "[0-9a-fA-F]{8,}", "~H")
    return F.regexp_replace(t, "[0-9]+", "~D")


def trap_stats(
    urls: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    min_urls: int = 50,
    min_compression: int = 10,
) -> DataFrame:
    """Per-host crawl-trap statistics:
    ``(host, n_urls, n_templates, max_template_urls, compression_q,
    is_trap)``.

    Crawl traps — calendars, faceted search, session-id links — generate
    unbounded URL sets from a handful of path *templates*; a polite
    crawler must detect and throttle them or a single host eats the
    frontier (crawld's analog is its per-crawler fetch budget,
    /root/reference/config/config.go throttler + limit fields, which
    bounds the damage but cannot name the offender). The detector:
    collapse every path to its template (:func:`url_template`), then per
    host compare URL cardinality to template cardinality.
    ``compression_q = n_urls div n_templates`` (integer-exact);
    ``is_trap`` = at least ``min_urls`` URLs AND compression at least
    ``min_compression`` — a host where thousands of URLs reduce to a few
    shapes is generating them mechanically.

    Scale shape (10^10 URLs): the template projection is codegen; the
    first aggregation ``groupBy(host, template)`` partial-aggregates on
    the scan side, so the shuffle carries template-cardinality rows (tiny
    short strings + counts), never raw URLs; the second ``groupBy(host)``
    is host-cardinality. No window, no Python, two map-side-combinable
    shuffles of shrinking size.
    """
    per_t = (
        urls.select(
            F.col(host_col).alias("host"),
            url_template(F.col(path_col)).alias("templ"),
        )
        .groupBy("host", "templ")
        .agg(F.count("*").cast("long").alias("n_urls_t"))
    )
    return (
        per_t.groupBy("host")
        .agg(
            F.sum("n_urls_t").cast("long").alias("n_urls"),
            F.count("*").cast("long").alias("n_templates"),
            F.max("n_urls_t").cast("long").alias("max_template_urls"),
        )
        .select(
            "host",
            "n_urls",
            "n_templates",
            "max_template_urls",
            F.expr("n_urls div n_templates").cast("long").alias(
                "compression_q"
            ),
            (
                (F.col("n_urls") >= F.lit(min_urls))
                & F.expr(f"n_urls div n_templates >= {min_compression}")
            ).alias("is_trap"),
        )
    )
