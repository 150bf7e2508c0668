"""Sitemap (sitemaps.org XML) parsing — the crawler's other seed source.

robots.txt tells a crawler what it may fetch (functions/robots.py); the
site's sitemap tells it what EXISTS: ``<urlset>`` of ``<url>`` entries
with ``<loc>``, optional ``<lastmod>`` / ``<changefreq>`` / ``<priority>``,
and ``<sitemapindex>`` files that point at child sitemaps. Feeding those
entries into the frontier (seed expansion, with the sitemap's priority as
the initial rank and lastmod as the recrawl hint — the
operators/freshness.change_rate prior) is standard crawler behavior the
reference lacks but any web-scale deployment needs.

Parsing is regex-tag extraction in pure Python over Arrow batches —
sitemaps are machine-generated, flat, and element-ordered, so a
streaming-tag scan is robust without an XML dependency (the container has
no lxml; stdlib ElementTree would also work but draws in entity handling
this format never uses). Deterministic: document order preserved,
malformed entries (no <loc>) skipped and counted.

Scale: one sitemap file ≤ 50k URLs by spec — a single Arrow batch;
parallelism is across sitemap files exactly like WARC segments. The
output is (host-keyed) seed rows: the same admission path as any other
frontier source, so dedup/politeness apply unchanged.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

_URL_BLOCK_RE = re.compile(rb"<url>(.*?)</url>", re.DOTALL)
_SM_BLOCK_RE = re.compile(rb"<sitemap>(.*?)</sitemap>", re.DOTALL)
_LOC_RE = re.compile(rb"<loc>\s*(.*?)\s*</loc>", re.DOTALL)
_LASTMOD_RE = re.compile(rb"<lastmod>\s*(.*?)\s*</lastmod>", re.DOTALL)
_PRIO_RE = re.compile(rb"<priority>\s*(.*?)\s*</priority>", re.DOTALL)

SITEMAP_SCHEMA = (
    "loc string, lastmod timestamp, priority double, is_index boolean"
)


def _unescape(b: bytes) -> str:
    return (
        b.replace(b"&lt;", b"<")
        .replace(b"&gt;", b">")
        .replace(b"&quot;", b'"')
        .replace(b"&apos;", b"'")
        .replace(b"&amp;", b"&")  # last: &amp;lt; must not become <
        .decode("utf-8", errors="replace")
    )


def parse_sitemap_bytes(blob: bytes) -> tuple[list[dict], int]:
    """Parse one sitemap or sitemap-index document. Returns
    ``(entries, n_skipped)``; each entry is ``{"loc", "lastmod",
    "priority", "is_index"}`` (lastmod/priority None when absent,
    is_index True for <sitemapindex> children). Entries without a <loc>
    are skipped and counted."""
    entries: list[dict] = []
    skipped = 0
    for is_index, block_re in ((False, _URL_BLOCK_RE), (True, _SM_BLOCK_RE)):
        for m in block_re.finditer(blob):
            block = m.group(1)
            loc = _LOC_RE.search(block)
            if not loc or not loc.group(1):
                skipped += 1
                continue
            lastmod = _LASTMOD_RE.search(block)
            prio = _PRIO_RE.search(block)
            ts = None
            if lastmod:
                try:
                    ts = pd.Timestamp(_unescape(lastmod.group(1)))
                except (ValueError, TypeError):
                    ts = None
            p = None
            if prio:
                try:
                    p = float(prio.group(1))
                except ValueError:
                    p = None
            entries.append(
                {
                    "loc": _unescape(loc.group(1)),
                    "lastmod": ts,
                    "priority": p,
                    "is_index": is_index,
                }
            )
    return entries, skipped


def sitemap_xml_of(entries: list[tuple[str, str | None, float | None]]) -> bytes:
    """Serialize (loc, lastmod_iso, priority) tuples into a spec-shaped
    <urlset> document (the fixture generator twin of the parser)."""
    parts = [
        b'<?xml version="1.0" encoding="UTF-8"?>\n',
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n',
    ]
    for loc, lastmod, prio in entries:
        esc = loc.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        parts.append(b"<url><loc>" + esc.encode() + b"</loc>")
        if lastmod is not None:
            parts.append(b"<lastmod>" + str(lastmod).encode() + b"</lastmod>")
        if prio is not None:
            parts.append(b"<priority>" + f"{prio:.1f}".encode() + b"</priority>")
        parts.append(b"</url>\n")
    parts.append(b"</urlset>\n")
    return b"".join(parts)


def read_sitemaps(spark, path: str):
    """Distributed sitemap ingest: binaryFile scan → Arrow-batched parse →
    (loc, lastmod, priority, is_index) rows — the seed-expansion shape
    (feed loc into the frontier admission path; lastmod/priority become
    the initial rank / freshness prior)."""
    from crawld_spark.shiplib import ensure_shipped

    ensure_shipped(spark)

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for blob in b["content"]:
                recs, _ = parse_sitemap_bytes(bytes(blob))
                rows.extend(recs)
            yield pd.DataFrame(
                rows, columns=["loc", "lastmod", "priority", "is_index"]
            )

    return files.mapInPandas(parse, schema=SITEMAP_SCHEMA)
