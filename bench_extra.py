#!/usr/bin/env python
"""Per-lane measurement harness for the optimization round (guide §1).

NOT the driver contract — bench.py stays frozen. This script times
individual query lanes with the same methodology as bench.py (df.count()
on local[$SPARK_GRAFT_CPUS], shuffle_partitions=$SPARK_GRAFT_CPUS), with
repeats, and can dump .explain("formatted") for each lane to plans/r06/.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --repeats 2 lane1 lane2 ...
  python bench_extra.py --explain plans/r06 --suffix before lane1 ...
  python bench_extra.py --all            # every HEADLINE lane once
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawld_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("lanes", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--explain", default="", help="directory to write explain dumps")
    ap.add_argument("--suffix", default="before", help="explain file suffix")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--ui", action="store_true", help="enable the Spark UI on :4040")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    import bench as bench_mod
    import __spark_entry__ as contract

    lanes = list(args.lanes) or (bench_mod.HEADLINE if args.all else [])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    extra = {"spark.ui.enabled": "true"} if args.ui else {}
    spark = get_spark(
        "bench_extra", master=f"local[{cpus}]", shuffle_partitions=int(cpus),
        extra_conf=extra,
    )
    qs = contract.queries()
    out: dict[str, list[float]] = {}
    try:
        for name in lanes:
            if name not in qs:
                print(f"## unknown lane {name}", file=sys.stderr)
                continue
            if args.explain:
                os.makedirs(args.explain, exist_ok=True)
                df = qs[name](spark, args.sf)
                p = os.path.join(args.explain, f"{name}_{args.suffix}.txt")
                with open(p, "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
                print(f"explain -> {p}", file=sys.stderr)
            samples = []
            for r in range(args.repeats):
                spark.sparkContext.setJobDescription(f"{name} r{r}")
                t0 = time.perf_counter()
                df = qs[name](spark, args.sf)
                n = df.count()
                dt = round(time.perf_counter() - t0, 3)
                samples.append(dt)
                print(f"{name} [{r}] {dt}s rows={n}", flush=True)
            out[name] = samples
        print(json.dumps({k: v for k, v in out.items()}))
        if args.json_out:
            with open(args.json_out, "w") as fh:
                json.dump(out, fh, indent=1)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
