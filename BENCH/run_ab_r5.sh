#!/bin/bash
# r4-vs-r5 A/B campaign (protocol: BENCH/README.md): crawl + queries +
# frontier, sequential (never two Spark jobs at once), assembled into
# BENCH/AB_r4_vs_r5.json. a = .worktrees/r4 (a12de63), b = r5 HEAD.
set -u
cd /root/repo
R4=/root/repo/.worktrees/r4
OUT=/tmp/ab_r5
mkdir -p "$OUT"
python bench_ab.py "$R4" /root/repo 5 --mode=crawl    > "$OUT/crawl.json"    2> "$OUT/crawl.log"    || echo "CRAWL_FAILED"
python bench_ab.py "$R4" /root/repo 4 --mode=queries  > "$OUT/queries.json"  2> "$OUT/queries.log"  || echo "QUERIES_FAILED"
python bench_ab.py "$R4" /root/repo 4 --mode=frontier > "$OUT/frontier.json" 2> "$OUT/frontier.log" || echo "FRONTIER_FAILED"
python - <<'EOF'
import json
modes = {}
for m in ("crawl", "queries", "frontier"):
    try:
        with open(f"/tmp/ab_r5/{m}.json") as f:
            modes[m] = json.load(f)
    except Exception as e:
        modes[m] = {"error": str(e)}
doc = {
    "metric": "r4 (a) vs r5 (b) interleaved pinned fresh-JVM A/B: crawl + query-suite + frontier",
    "protocol": "see BENCH/README.md; a=.worktrees/r4 (a12de63), b=r5 HEAD",
    "modes": modes,
}
with open("/root/repo/BENCH/AB_r4_vs_r5.json", "w") as f:
    json.dump(doc, f, indent=1)
print("ASSEMBLED BENCH/AB_r4_vs_r5.json")
EOF
echo "AB_CAMPAIGN_DONE"
