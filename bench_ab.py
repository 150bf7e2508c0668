#!/usr/bin/env python
"""Interleaved A/B of the synthetic-crawl wall time between two checkouts
(VERDICT r2 item 1: settle the r2 crawl-wall regression with a paired
protocol, not argument).

Protocol = the same measurement hygiene as bench_scaling.py: the sandbox
VM's throughput drifts 2-3× over minutes, so a lone number from each
version is meaningless. Each round runs version A then B (or B then A —
order alternates) back-to-back in the same noise window, each in a fresh
pinned subprocess JVM via ``bench.py`` with ``SPARK_GRAFT_BENCH_ONLY=crawl``
(identical config, identical deterministic input). Reported: per-round
pairs, the min wall per version (least-contaminated estimate of true
machine time — noise only ever slows a run), and the min/min ratio.

Usage:
  python bench_ab.py /path/to/repoA /path/to/repoB [rounds] [--write-note]

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


def run_crawl(repo: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(CPUS),
        SPARK_GRAFT_BENCH_ONLY="crawl",
        SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
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


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repo_a, repo_b = os.path.abspath(args[0]), os.path.abspath(args[1])
    rounds_n = int(args[2]) if len(args) > 2 else 5
    pairs = []
    for i in range(rounds_n):
        order = "AB" if i % 2 == 0 else "BA"
        if order == "AB":
            ra, rb = run_crawl(repo_a), run_crawl(repo_b)
        else:
            rb, ra = run_crawl(repo_b), run_crawl(repo_a)
        pairs.append(
            {
                "round": i + 1,
                "order": order,
                "a_crawl_sec": ra["crawl_sec"],
                "b_crawl_sec": rb["crawl_sec"],
                "a_urls_per_sec": ra.get("urls_per_sec"),
                "b_urls_per_sec": rb.get("urls_per_sec"),
                "b_over_a": round(rb["crawl_sec"] / ra["crawl_sec"], 3),
            }
        )
        print(json.dumps(pairs[-1]), file=sys.stderr, flush=True)
    min_a = min(p["a_crawl_sec"] for p in pairs)
    min_b = min(p["b_crawl_sec"] for p in pairs)
    summary = {
        "metric": "crawl wall A/B (interleaved pairs, pinned, fresh JVMs)",
        "cpus": CPUS,
        "repo_a": repo_a,
        "repo_b": repo_b,
        "rounds": pairs,
        "min_a_crawl_sec": min_a,
        "min_b_crawl_sec": min_b,
        "min_ratio_b_over_a": round(min_b / min_a, 3),
        "wins_b": sum(1 for p in pairs if p["b_crawl_sec"] < p["a_crawl_sec"]),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
