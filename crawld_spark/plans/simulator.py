"""Pure-Python single-threaded reference simulator (SURVEY.md §5.2.4).

Plays the role the reference implementation itself plays for crawld: the
authoritative sequential semantics the distributed engine must reproduce
*exactly* — same seed list, same politeness budget → same (round, url) fetch
trace, same discovery_seq assignment, same final seen set and host clocks
(north_rule: "matching the reference's crawl ordering and URL-seen set").

Mirrors plans/rounds.py step for step, including float arithmetic order
(virtual clock adds), the since_seq first-round-only predicate
(≙ /root/reference/crawld.go:116,266), retry-forever semantics
(crawld.go:92-95), the leaky-bucket throttle (crawld.go:404-409), the
two-phase language filter (case-sensitive primary then case-insensitive
fallback, crawlers/util.go:75-106), global/per-language fetch budgets
(crawlers/github.go:121 vs :225), the two failure lanes (network → retry;
non-network update error → destroy + re-clone, crawld.go:92-104), the
too_many_calls rate-limit sleep (crawlers/github.go:98-107), and
recrawl-after-k-rounds with the clone-vs-update branch (crawld.go:185-217).
Shares the literal extraction/canonicalization/path code with the engine
(functions/url.py, functions/extract.py, operators/politeness.path_of) —
not a reimplementation.

Page dict format: ``url -> {text, links, lang[, error]}`` where ``error`` is
None (default), 'too_many_calls', or 'unavailable' — the C7 taxonomy classes
(≙ crawlers/github.go:1005-1026). A url absent from the dict is a network
error.
"""

from __future__ import annotations

import hashlib
import heapq
from dataclasses import dataclass, field

from crawld_spark.config import CrawlConfig
from crawld_spark.functions.url import canonicalize_one, host_of
from crawld_spark.operators.politeness import path_of

_SIG_SCALE = 1_000_000  # mirrors graph.SCALE / freshness.SCALE


def _int_pagerank(edges: list[tuple[str, str]], n_iter: int) -> dict[str, int]:
    """Pure-Python twin of graph.pagerank (integer micro-unit arithmetic,
    identical floor divisions) over string-keyed edges."""
    nodes: set[str] = set()
    out_deg: dict[str, int] = {}
    for s, d in edges:
        nodes.add(s)
        nodes.add(d)
        out_deg[s] = out_deg.get(s, 0) + 1
    rank = {n: _SIG_SCALE for n in nodes}
    floor_base = (_SIG_SCALE * 15) // 100
    for _ in range(max(1, n_iter)):
        in_sum: dict[str, int] = {}
        for s, d in edges:
            in_sum[d] = in_sum.get(d, 0) + rank[s] // out_deg[s]
        rank = {n: floor_base + (85 * in_sum.get(n, 0)) // 100 for n in nodes}
    return rank


def _signal_eff(
    fetched_links: dict[str, list[str]],
    fetch_hist: dict[str, list[tuple[int, str]]],
    now_round: int,
    cfg: CrawlConfig,
) -> dict[str, float]:
    """Mirror of CrawlEngine._signal_priorities: absolute composed priority
    per signal-covered url — integer PageRank over the latest-fetch link
    graph + inbound link counts + freshness priority_q, with the config's
    integer weights; float() at the very end (exact below 2^53)."""
    edges: list[tuple[str, str]] = []
    for src, links in fetched_links.items():
        for raw in links:
            cu = canonicalize_one(raw)
            if cu is not None:
                edges.append((src, cu))
    rank = _int_pagerank(edges, cfg.signal_pr_iters)
    inlinks: dict[str, int] = {}
    for _, d in edges:
        inlinks[d] = inlinks.get(d, 0) + 1
    fresh: dict[str, int] = {}
    for url, hist in fetch_hist.items():
        n_obs = len(hist)
        n_changes = sum(1 for i in range(1, n_obs) if hist[i][1] != hist[i - 1][1])
        lam = (_SIG_SCALE * n_changes) // max(n_obs - 1, 1)
        fresh[url] = lam * (now_round - hist[-1][0])
    return {
        url: float(
            rank.get(url, 0) * cfg.signal_w_pagerank
            + inlinks.get(url, 0) * cfg.signal_w_anchor
            + fresh.get(url, 0) * cfg.signal_w_freshness
        )
        for url in set(rank) | set(inlinks) | set(fresh)
    }


@dataclass
class SimHost:
    next_allowed_vt: float = 0.0
    crawl_delay_s: float = 1.0
    error_score: float = 0.0
    last_error_vt: float = 0.0


@dataclass
class SimRow:
    url: str
    host: str
    priority: float
    discovery_seq: int
    status: str = "pending"
    round_added: int = 0
    attempts: int = 0
    last_round: int | None = None


@dataclass
class SimResult:
    trace: list[tuple[int, int, str]] = field(default_factory=list)  # (round, seq_in_round, url)
    frontier: dict[str, SimRow] = field(default_factory=dict)
    fetched_text: dict[str, str] = field(default_factory=dict)
    hosts: dict[str, SimHost] = field(default_factory=dict)
    rounds_run: int = 0


def simulate(
    pages: dict[str, dict],  # url -> {text, links, lang[, error]}
    seeds: list[tuple[str, float]],
    robots: dict[str, tuple[list[str], float]],
    cfg: CrawlConfig,
    max_rounds: int = 1000,
) -> SimResult:
    cfg = cfg.validate()
    res = SimResult()
    fr = res.frontier
    hosts = res.hosts
    lower_langs = {l.lower() for l in cfg.languages}

    def lang_wanted(lang: str | None) -> str | None:
        """F4 two-phase verdict: 'primary' | 'fallback' | None (reject)."""
        if not cfg.languages:
            return "primary"
        if lang in cfg.languages:  # case-SENSITIVE stage 1
            return "primary"
        if cfg.lang_ci_fallback and lang is not None and lang.lower() in lower_langs:
            return "fallback"  # case-INSENSITIVE stage 2
        return None

    # ---- bootstrap (round 0): admit seeds ----
    cand: dict[str, float] = {}
    for url, pri in seeds:
        cu = canonicalize_one(url)
        if cu is None:
            continue
        cand[cu] = max(cand.get(cu, float("-inf")), float(pri))
    seq = 0
    for url in sorted(cand, key=lambda u: (-cand[u], u)):
        seq += 1
        fr[url] = SimRow(url, host_of(url), cand[url], seq, "pending", 0, 0)
    max_seq = seq

    # cumulative fetch-event counters for the F6 budget
    total_fetches = 0
    fetches_by_lang: dict[str, int] = {}
    # measured-signal inputs (mirror of the committed fetched table):
    # latest-fetch out-links per url + (round, text-md5) history per url
    fetched_links: dict[str, list[str]] = {}
    fetch_hist: dict[str, list[tuple[int, str]]] = {}

    # ---- fetch rounds ----
    for r in range(1, max_rounds + 1):
        if cfg.limit > 0 and not cfg.limit_per_language and total_fetches >= cfg.limit:
            break  # global budget spent (≙ crawlers/github.go:128-129)

        def eligible(row: SimRow) -> bool:
            if row.status == "pending":
                return True
            return (
                cfg.recrawl_after_rounds > 0
                and row.status == "fetched"
                and row.last_round is not None
                and row.last_round <= r - cfg.recrawl_after_rounds
            )

        pending = [row for row in fr.values() if eligible(row)]
        if r == 1 and cfg.since_seq > 0:
            pending = [row for row in pending if row.discovery_seq >= cfg.since_seq]
        can_ever = any(row.status == "pending" for row in fr.values()) or (
            cfg.recrawl_after_rounds > 0
            and any(row.status == "fetched" for row in fr.values())
        )
        if not can_ever:
            break
        if not pending:
            # nothing eligible this round (since_seq round-1 exclusion, or a
            # recrawl gap the engine fast-forwards over) — no state changes
            res.rounds_run = r
            continue
        res.rounds_run = r
        t_start = r * cfg.round_duration_s
        t_end = t_start + cfg.round_duration_s

        # measured-signal firing round: signal-covered urls are ordered (and,
        # if touched, persisted) by the composed absolute priority — mirror
        # of rounds.py's _signals_fire/_signal_priorities
        eff: dict[str, float] | None = None
        if cfg.signal_priority_every > 0 and r % cfg.signal_priority_every == 0:
            eff = _signal_eff(fetched_links, fetch_hist, r, cfg)

        def pr_of(row: SimRow) -> float:
            if eff is not None and row.url in eff:
                return eff[row.url]
            return row.priority

        by_host: dict[str, list[SimRow]] = {}
        for row in pending:
            by_host.setdefault(row.host, []).append(row)

        fetch_entries: list[tuple[SimRow, float]] = []  # (row, sched_vt)
        for host, rows in by_host.items():
            prefixes, delay = robots.get(host, ([], cfg.default_crawl_delay_s))
            st = hosts.get(host, SimHost(0.0, delay, 0.0, 0.0))
            heap: list[tuple[float, int, str]] = []
            rows_by_url = {}
            for row in rows:
                if any(path_of(row.url).startswith(p) for p in prefixes):
                    row.priority = pr_of(row)  # denied rows persist signal pri
                    row.status = "denied"
                    continue
                heapq.heappush(heap, (-pr_of(row), row.discovery_seq, row.url))
                rows_by_url[row.url] = row
            t = max(st.next_allowed_vt, t_start)
            k = 0
            while heap and t < t_end and k < cfg.max_urls_per_host_per_round:
                _, _, url = heapq.heappop(heap)
                fetch_entries.append((rows_by_url[url], t))
                t += max(delay, 1e-9)
                k += 1

        if cfg.max_urls_per_round > 0:
            fetch_entries.sort(key=lambda e: (-pr_of(e[0]), e[0].discovery_seq))
            fetch_entries = fetch_entries[: cfg.max_urls_per_round]
        n_scheduled = len(fetch_entries)  # pre-budget-cap (engine's n_sched)

        # ---- F6 fetch budget: over-budget would-be-OK rows drop out of the
        # round entirely (stay pending, no clock slot — mirrors the engine's
        # pre-cache window cut) ----
        if cfg.limit > 0:
            fetch_entries.sort(key=lambda e: (-pr_of(e[0]), e[0].discovery_seq))
            kept, used = [], {}
            for row, vt in fetch_entries:
                page = pages.get(row.url)
                is_ok = (
                    page is not None
                    and page.get("error") is None
                    and not (not cfg.keep_forks and page.get("fork"))
                    and lang_wanted(page["lang"]) is not None
                )
                if is_ok:
                    key = page["lang"] if cfg.limit_per_language else None
                    prior = (
                        fetches_by_lang.get(key, 0)
                        if cfg.limit_per_language
                        else total_fetches
                    )
                    if prior + used.get(key, 0) + 1 > cfg.limit:
                        continue  # over budget → excluded from the round
                    used[key] = used.get(key, 0) + 1
                kept.append((row, vt))
            fetch_entries = kept

        # rows that made it into the round (post-cut, post-budget) are the
        # engine's "touched" set — they persist the signal priority
        if eff is not None:
            for row, _vt in fetch_entries:
                row.priority = pr_of(row)

        # ---- host clock advance inputs (mirror of advance_host_state) ----
        per_host_sched: dict[str, list[float]] = {}
        for row, vt in fetch_entries:
            per_host_sched.setdefault(row.host, []).append(vt)
        errors_by_host: dict[str, int] = {}
        rate_limited_hosts: set[str] = set()

        # ---- the fetch ----
        new_cand: dict[str, float] = {}
        ok_fetches: list[SimRow] = []

        def retry(row: SimRow) -> None:
            row.attempts += 1
            if cfg.max_attempts > 0 and row.attempts >= cfg.max_attempts:
                row.status = "failed"
            else:
                row.status = "pending"

        for row, vt in fetch_entries:
            fetch_kind = "clone" if row.last_round is None else "update"
            page = pages.get(row.url)
            if page is None:
                # network error lane: skip, retry next round (crawld.go:92-95)
                errors_by_host[row.host] = errors_by_host.get(row.host, 0) + 1
                retry(row)
                continue
            err = page.get("error")
            if err is not None:
                errors_by_host[row.host] = errors_by_host.get(row.host, 0) + 1
                if err == "too_many_calls":
                    rate_limited_hosts.add(row.host)
                    retry(row)
                elif err == "unavailable" and fetch_kind == "update":
                    # destroy + re-clone lane (crawld.go:97-104): reset to
                    # first-contact state; next fetch is a clone
                    row.status = "pending"
                    row.last_round = None
                    row.attempts = 0
                else:
                    retry(row)
                continue
            if not cfg.keep_forks and page.get("fork"):
                # F3: fork skip runs BEFORE the language filter
                # (crawlers/github.go:166-182 ordering)
                row.status = "filtered"
                continue
            stage = lang_wanted(page["lang"])
            if stage is None:
                row.status = "filtered"
                continue
            row.status = "fetched"
            row.last_round = r
            res.fetched_text[row.url] = page["text"]
            fetched_links[row.url] = list(page["links"])
            fetch_hist.setdefault(row.url, []).append(
                (r, hashlib.md5(page["text"].encode("utf-8")).hexdigest())
            )
            ok_fetches.append(row)
            total_fetches += 1
            fetches_by_lang[page["lang"]] = fetches_by_lang.get(page["lang"], 0) + 1
            for raw in page["links"]:
                cu = canonicalize_one(raw)
                if cu is None:
                    continue
                p = row.priority - cfg.link_priority_decay
                new_cand[cu] = max(new_cand.get(cu, float("-inf")), p)

        # trace: this round's successful fetches in canonical total order
        ok_fetches.sort(key=lambda x: (-x.priority, x.discovery_seq))
        for i, row in enumerate(ok_fetches):
            res.trace.append((r, i, row.url))

        # ---- admission (seen set = frontier keys; exact) ----
        admitted = {u: p for u, p in new_cand.items() if u not in fr}
        for url in sorted(admitted, key=lambda u: (-admitted[u], u)):
            max_seq += 1
            fr[url] = SimRow(url, host_of(url), admitted[url], max_seq, "pending", r, 0)

        # ---- host_state update (mirror: host_state ∪ hosts-with-fetches) ----
        all_hosts = set(hosts) | set(per_host_sched)
        for host in all_hosts:
            prefixes, delay = robots.get(host, ([], cfg.default_crawl_delay_s))
            st = hosts.setdefault(host, SimHost(0.0, delay, 0.0, 0.0))
            vts = per_host_sched.get(host)
            if vts:
                st.next_allowed_vt = max(vts) + st.crawl_delay_s
            else:
                st.next_allowed_vt = max(st.next_allowed_vt, t_start)
            if host in rate_limited_hosts:
                # sleep until quota reset (≙ crawlers/github.go:98-107)
                st.next_allowed_vt = (
                    max(st.next_allowed_vt, t_end) + cfg.rate_limit_wait_s
                )
            n_err = errors_by_host.get(host, 0)
            leaked = max(0.0, st.error_score - (t_end - st.last_error_vt) / cfg.throttler_leak_s)
            st.error_score = leaked + float(n_err)
            if n_err > 0:
                st.last_error_vt = t_end
            if st.error_score >= cfg.throttler_window:
                st.next_allowed_vt += cfg.throttler_wait_s
                st.error_score = 0.0

        # budget stalemate mirror (rounds.py run()): everything schedulable
        # is over-budget → the next round would be identical, stop
        if cfg.limit > 0 and not ok_fetches and not admitted and n_scheduled > 0:
            break

    return res
