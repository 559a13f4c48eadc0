"""Re-verify ONE official bench number in one command (VERDICT r3 #6).

Runs a single named bench query through the IDENTICAL code path the
official bench uses (bench.build_benches), with a warm-up pass plus N
timed samples, and prints a JSON line with all samples — so a suspicious
number in BENCH_r{N}.json can be attributed to host weather vs code in
under a minute.

Usage:
    python scripts/bench_one.py extract_turns [--runs 5]
        [--sf-dir /root/testdata/sf0.1] [--cpus 32]
    python scripts/bench_one.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench  # noqa: E402
from pdf_parse_new_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query", nargs="?", help="bench query name")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--cpus", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    args = ap.parse_args()

    spark = get_spark("bench_one", cores=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    counters: dict[str, int] = {}
    benches = dict(bench.build_benches(spark, args.sf_dir, args.cpus, counters))
    if not args.query or args.query not in benches:
        print(json.dumps({"available": sorted(benches)}))
        sys.exit(0 if args.query is None else 2)

    fn = benches[args.query]
    fn()  # warm-up (Python workers / page cache / broadcast state)
    samples = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    s = sorted(samples)
    print(
        json.dumps(
            {
                "query": args.query,
                "best": s[0],
                "median": s[len(s) // 2],
                "max": s[-1],
                "samples": samples,
                "sf_dir": args.sf_dir,
                "cpus": args.cpus,
                "counters": counters,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
