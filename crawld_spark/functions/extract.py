"""HTML wrapping + text/link extraction.

The synthetic web (FIXTURES.md B1) is generated *text-first*: a page's
``text`` column is authoritative, and ``html`` is a deterministic wrapper
around it. ``extract_text(html)`` must invert the wrapper **byte-for-byte
per url** (BASELINE.json input_hint). This is the graft's analog of the
reference's invariant "a clone contains exactly what the remote has"
(/root/reference/repo/git.go:45-54 — a git clone is bit-exact content
transfer).

Escape/unescape is a minimal 3-entity scheme proven inverse by construction
(and by property tests): escape replaces ``&`` first then ``<``/``>``;
unescape replaces ``&lt;``/``&gt;`` first then ``&amp;`` last, which is the
exact inverse for *any* input text (single-pass, no double-unescaping).

Link extraction ≙ the reference's set-expansion lookups (org members /
contributors, crawlers/github.go:941-1002) — one fetched entity yields the
next crawl candidates.

All Spark entry points are scalar Arrow/pandas UDFs over binary/string
columns; the pure-Python ``*_one`` cores are shared with the golden-trace
simulator (plans/simulator.py) so engine and oracle run literally the same
extraction code.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BinaryType, StringType

_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.S)
_HREF_RE = re.compile(rb'<a href="([^"]*)">')
_ANCHOR_RE = re.compile(rb'<a href="([^"]*)">([^<]*)</a>')


def _escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _unescape(text: str) -> str:
    return text.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


def wrap_html_one(url: str, text: str, links: list[str]) -> bytes:
    """Deterministic page body: title = url, one <article> with the escaped
    text, one <nav> with one anchor per link, in order."""
    anchors = "\n".join(f'<a href="{l}">l{i}</a>' for i, l in enumerate(links))
    page = (
        "<!DOCTYPE html>\n"
        f"<html><head><meta charset=\"utf-8\"><title>{_escape(url)}</title></head>\n"
        "<body>\n"
        f"<article>{_escape(text)}</article>\n"
        f"<nav>\n{anchors}\n</nav>\n"
        "</body></html>\n"
    )
    return page.encode("utf-8")


def extract_text_one(html: bytes | None) -> str | None:
    if html is None:
        return None
    m = _ARTICLE_RE.search(html)
    if m is None:
        return None
    return _unescape(m.group(1).decode("utf-8"))


def extract_links_one(html: bytes | None) -> list[str] | None:
    if html is None:
        return None
    return [h.decode("utf-8") for h in _HREF_RE.findall(html)]


def extract_anchors_one(html: bytes | None) -> list[str] | None:
    """(href, anchor-text) pairs, tab-joined — ``"href\\tanchor"`` per
    element, in document order. Tab-joined rather than struct-typed so the
    Arrow transfer stays a flat list<utf8> (structs-in-lists cost an extra
    child-array hop); callers split JVM-side with ``split(x, '\\t', 2)``.
    URLs cannot contain a raw tab (RFC 3986); anchor text on real-world
    HTML can, so tabs in anchor text are normalized to a single space
    before joining — the pair encoding is therefore lossless for hrefs and
    space-normalized for anchors (ADVICE r4)."""
    if html is None:
        return None
    return [
        h.decode("utf-8") + "\t" + _unescape(a.decode("utf-8")).replace("\t", " ")
        for h, a in _ANCHOR_RE.findall(html)
    ]


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(extract_text_one, na_action="ignore")


@pandas_udf(ArrayType(StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    return html.map(extract_links_one, na_action="ignore")


@pandas_udf(ArrayType(StringType()))
def extract_anchors(html: pd.Series) -> pd.Series:
    return html.map(extract_anchors_one, na_action="ignore")


@pandas_udf(BinaryType())
def wrap_html(url: pd.Series, text: pd.Series, links: pd.Series) -> pd.Series:
    return pd.Series(
        [
            wrap_html_one(u, t, list(ls) if ls is not None else [])
            for u, t, ls in zip(url, text, links)
        ]
    )
