#!/bin/bash
# r3-vs-r4 A/B campaign (VERDICT r3 item 5): crawl 5 pairs, queries 4 pairs,
# frontier 4 pairs — sequential (never two Spark jobs at once), then
# assembled into BENCH/AB_r3_vs_r4.json.
set -u
cd /root/repo
R3=/root/repo/.worktrees/r3
OUT=/tmp/ab_r4
mkdir -p "$OUT"
python bench_ab.py "$R3" /root/repo 5 --mode=crawl    > "$OUT/crawl.json"    2> "$OUT/crawl.log"    || echo "CRAWL_FAILED"
python bench_ab.py "$R3" /root/repo 4 --mode=queries  > "$OUT/queries.json"  2> "$OUT/queries.log"  || echo "QUERIES_FAILED"
python bench_ab.py "$R3" /root/repo 4 --mode=frontier > "$OUT/frontier.json" 2> "$OUT/frontier.log" || echo "FRONTIER_FAILED"
python - <<'EOF'
import json
modes = {}
for m in ("crawl", "queries", "frontier"):
    try:
        with open(f"/tmp/ab_r4/{m}.json") as f:
            modes[m] = json.load(f)
    except Exception as e:
        modes[m] = {"error": str(e)}
doc = {
    "metric": "r3 (a) vs r4 (b) interleaved pinned fresh-JVM A/B: crawl + query-suite + frontier",
    "protocol": "see BENCH/README.md; a=.worktrees/r3 (046fc73), b=r4 HEAD",
    "modes": modes,
}
with open("/root/repo/BENCH/AB_r3_vs_r4.json", "w") as f:
    json.dump(doc, f, indent=1)
print("ASSEMBLED BENCH/AB_r3_vs_r4.json")
EOF
echo "AB_CAMPAIGN_DONE"
