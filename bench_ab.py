#!/usr/bin/env python
"""Interleaved A/B of bench surfaces between two checkouts.

r3 settled the crawl-wall question with this protocol (VERDICT r2 item 1);
r4 extends it to the QUERY SUITE and the FRONTIER dedup/schedule path
(VERDICT r3 item 5) so headline movements stop being noise-unattributable.

Protocol = the same measurement hygiene as bench_scaling.py: the sandbox
VM's throughput drifts 2-3× over minutes, so a lone number from each
version is meaningless. Each round runs version A then B (or B then A —
order alternates) back-to-back in the same noise window, each in a fresh
pinned subprocess JVM via ``bench.py`` with ``SPARK_GRAFT_BENCH_ONLY``
set to the chosen mode (identical config, identical deterministic input).
Reported: per-round pairs, the min wall per version (least-contaminated
estimate of true machine time — noise only ever slows a run), the min/min
ratio, and — in queries mode — PER-QUERY min-over-rounds ratios.

Usage:
  python bench_ab.py /path/to/repoA /path/to/repoB [rounds] [--mode=crawl|queries|frontier]

Each path must be a checkout with bench.py at its root (use git worktrees
for the two versions).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CPUS = int(os.environ.get("SPARK_GRAFT_AB_CPUS", "16"))


def _pin(cpus: int) -> list[str]:
    import shutil

    if shutil.which("taskset"):
        return ["taskset", "-c", f"0-{cpus - 1}"]
    return []


def run_bench(repo: str, mode: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(CPUS),
        SPARK_GRAFT_BENCH_ONLY=mode,
        SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        # A/B compares the query suite only — side benches (bpe50k) would
        # lengthen one side's window without being part of the comparison
        SPARK_GRAFT_BENCH_BPE="0",
    )
    out = subprocess.run(
        _pin(CPUS) + [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, cwd=repo,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"bench.py failed in {repo} (rc={out.returncode}):\n"
            + out.stderr[-2000:]
        )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py produced no JSON line in {repo}; stderr tail:\n"
            + out.stderr[-2000:]
        )
    return json.loads(lines[-1])


def _wall(r: dict, mode: str) -> float:
    if mode == "crawl":
        return float(r["crawl_sec"])
    if mode == "frontier":
        return float(r["frontier_sec"])
    return float(sum(r.get("queries", {}).values()))


def main() -> None:
    mode = "crawl"
    for a in sys.argv[1:]:
        if a.startswith("--mode="):
            mode = a.split("=", 1)[1]
    assert mode in ("crawl", "queries", "frontier"), mode
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repo_a, repo_b = os.path.abspath(args[0]), os.path.abspath(args[1])
    rounds_n = int(args[2]) if len(args) > 2 else 5
    pairs = []
    for i in range(rounds_n):
        order = "AB" if i % 2 == 0 else "BA"
        if order == "AB":
            ra, rb = run_bench(repo_a, mode), run_bench(repo_b, mode)
        else:
            rb, ra = run_bench(repo_b, mode), run_bench(repo_a, mode)
        wa, wb = _wall(ra, mode), _wall(rb, mode)
        rec = {
            "round": i + 1,
            "order": order,
            "a_sec": round(wa, 3),
            "b_sec": round(wb, 3),
            "b_over_a": round(wb / wa, 3) if wa else None,
        }
        if mode == "crawl":
            rec["a_urls_per_sec"] = ra.get("urls_per_sec")
            rec["b_urls_per_sec"] = rb.get("urls_per_sec")
        if mode == "frontier":
            rec["a_urls_per_sec"] = ra.get("frontier_urls_per_sec")
            rec["b_urls_per_sec"] = rb.get("frontier_urls_per_sec")
        if mode == "queries":
            rec["a_queries"] = ra.get("queries", {})
            rec["b_queries"] = rb.get("queries", {})
        pairs.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
    if mode == "queries":
        # compare the SHARED query set only (a side may carry new queries
        # the other doesn't have — they'd skew the suite total)
        shared = set.intersection(
            *[set(p["a_queries"]) & set(p["b_queries"]) for p in pairs]
        )
        for p in pairs:
            p["a_sec"] = round(sum(p["a_queries"][q] for q in shared), 3)
            p["b_sec"] = round(sum(p["b_queries"][q] for q in shared), 3)
            p["b_over_a"] = round(p["b_sec"] / p["a_sec"], 3) if p["a_sec"] else None
    min_a = min(p["a_sec"] for p in pairs)
    min_b = min(p["b_sec"] for p in pairs)
    summary = {
        "metric": f"{mode} wall A/B (interleaved pairs, pinned, fresh JVMs)",
        "mode": mode,
        "cpus": CPUS,
        "repo_a": repo_a,
        "repo_b": repo_b,
        "rounds": pairs,
        "min_a_sec": min_a,
        "min_b_sec": min_b,
        "min_ratio_b_over_a": round(min_b / min_a, 3),
        "wins_b": sum(1 for p in pairs if p["b_sec"] < p["a_sec"]),
    }
    if mode == "queries":
        # per-query min over rounds, per side → the per-query attribution
        # one-shot timings can't give (min discards contaminated windows)
        names = sorted(
            set().union(*[set(p["a_queries"]) | set(p["b_queries"]) for p in pairs])
        )
        per_q = {}
        for q in names:
            amin = min(
                (p["a_queries"][q] for p in pairs if q in p["a_queries"]),
                default=None,
            )
            bmin = min(
                (p["b_queries"][q] for p in pairs if q in p["b_queries"]),
                default=None,
            )
            per_q[q] = {
                "a_min": amin,
                "b_min": bmin,
                "b_over_a": round(bmin / amin, 3) if amin and bmin else None,
            }
        summary["per_query_min"] = per_q
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
