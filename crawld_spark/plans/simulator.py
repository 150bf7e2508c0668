"""Pure-Python single-threaded reference simulator (SURVEY.md §5.2.4).

Plays the role the reference implementation itself plays for crawld: the
authoritative sequential semantics the distributed engine must reproduce
*exactly* — same seed list, same politeness budget → same (round, url) fetch
trace, same discovery_seq assignment, same final seen set and host clocks
(north_rule: "matching the reference's crawl ordering and URL-seen set").

Mirrors plans/rounds.py step for step, including float arithmetic order
(virtual clock adds), the since_seq first-round-only predicate
(≙ /root/reference/crawld.go:116,266), retry-forever semantics
(crawld.go:92-95), and the leaky-bucket throttle (crawld.go:404-409).
Shares the literal extraction/canonicalization code with the engine
(functions/url.py, functions/extract.py) — not a reimplementation.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

from crawld_spark.config import CrawlConfig
from crawld_spark.functions.url import canonicalize_one, host_of


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


@dataclass
class SimResult:
    trace: list[tuple[int, int, str]] = field(default_factory=list)  # (round, seq_in_round, url)
    frontier: dict[str, SimRow] = field(default_factory=dict)
    fetched_text: dict[str, str] = field(default_factory=dict)
    hosts: dict[str, SimHost] = field(default_factory=dict)
    rounds_run: int = 0


def _path_of(url: str) -> str:
    i = url.find("://")
    j = url.find("/", i + 3) if i >= 0 else -1
    return url[j:] if j >= 0 else "/"


def simulate(
    pages: dict[str, dict],  # url -> {text, links, lang}
    seeds: list[tuple[str, float]],
    robots: dict[str, tuple[list[str], float]],
    cfg: CrawlConfig,
    max_rounds: int = 1000,
) -> SimResult:
    cfg = cfg.validate()
    res = SimResult()
    fr = res.frontier
    hosts = res.hosts

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

    # ---- fetch rounds ----
    for r in range(1, max_rounds + 1):
        pending = [row for row in fr.values() if row.status == "pending"]
        if r == 1 and cfg.since_seq > 0:
            pending = [row for row in pending if row.discovery_seq >= cfg.since_seq]
        if not any(row.status == "pending" for row in fr.values()):
            break
        if not pending:
            # nothing eligible this round but frontier still pending (since_seq
            # excluded everything on round 1) — later rounds see everything
            res.rounds_run = r
            continue
        res.rounds_run = r
        t_start = r * cfg.round_duration_s
        t_end = t_start + cfg.round_duration_s

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
                if any(_path_of(row.url).startswith(p) for p in prefixes):
                    row.status = "denied"
                    continue
                heapq.heappush(heap, (-row.priority, row.discovery_seq, row.url))
                rows_by_url[row.url] = row
            t = max(st.next_allowed_vt, t_start)
            k = 0
            while heap and t < t_end and k < cfg.max_urls_per_host_per_round:
                _, _, url = heapq.heappop(heap)
                fetch_entries.append((rows_by_url[url], t))
                t += max(delay, 1e-9)
                k += 1

        if cfg.max_urls_per_round > 0:
            fetch_entries.sort(key=lambda e: (-e[0].priority, e[0].discovery_seq))
            fetch_entries = fetch_entries[: cfg.max_urls_per_round]

        # ---- host clock advance (mirror of politeness.advance_host_state) ----
        per_host_sched: dict[str, list[float]] = {}
        for row, vt in fetch_entries:
            per_host_sched.setdefault(row.host, []).append(vt)
        errors_by_host: dict[str, int] = {}

        # ---- the fetch ----
        new_cand: dict[str, float] = {}
        ok_fetches: list[SimRow] = []
        for row, vt in fetch_entries:
            page = pages.get(row.url)
            if page is None:
                row.attempts += 1
                if cfg.max_attempts > 0 and row.attempts >= cfg.max_attempts:
                    row.status = "failed"
                errors_by_host[row.host] = errors_by_host.get(row.host, 0) + 1
                continue
            if cfg.languages and page["lang"] not in cfg.languages:
                row.status = "filtered"
                continue
            row.status = "fetched"
            res.fetched_text[row.url] = page["text"]
            ok_fetches.append(row)
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
            n_err = errors_by_host.get(host, 0)
            leaked = max(0.0, st.error_score - (t_end - st.last_error_vt) / cfg.throttler_leak_s)
            st.error_score = leaked + float(n_err)
            if n_err > 0:
                st.last_error_vt = t_end
            if st.error_score >= cfg.throttler_window:
                st.next_allowed_vt += cfg.throttler_wait_s
                st.error_score = 0.0

    return res
