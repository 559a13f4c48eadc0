"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 between N and 4N executors).

No real cluster exists in this sandbox, so we run the identical job on the
identical input at local[8] and local[32] (4x cores) in separate processes
and report turns/sec at both plus efficiency = (tput_32 / tput_8) / 4,
written to BENCH/BASELINE.md.

The measured job is the full pipeline: parquet scan -> mapInPandas
extraction -> salted ordered conversation concat -> noop sink. The corpus is
the deterministic bench corpus replicated to ~2.2M turns so that fixed
scheduling overhead (~1-2 s) amortizes; each timing is the median of 3 runs
after one warm-up (Python worker spin-up excluded, same as a long-running
cluster's steady state).

Usage: python scripts/scaling_bench.py          # orchestrates both levels
       python scripts/scaling_bench.py RUN 8    # single measured run (internal)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 7


def _corpus_path() -> str:
    from pdf_parse_new_spark import fixtures

    return (
        "/tmp/spark_graft_bench/"
        f"transcripts_scaling_v{fixtures.FIXTURES_VERSION}.parquet"
    )


CORPUS = _corpus_path()


def build_corpus() -> None:
    from pyspark.sql import functions as F

    import bench
    from pdf_parse_new_spark.session import get_spark

    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    spark = get_spark("scaling-corpus", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(bench.materialize(spark, "0.1"))
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    big = base.crossJoin(reps).withColumn(
        "conv_id", F.concat_ws("#", "conv_id", "rep")
    ).drop("rep")
    big.repartition(96).write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def measured_run(cores: int, n_runs: int = 4) -> dict:
    from pdf_parse_new_spark import pipeline
    from pdf_parse_new_spark.session import get_spark

    spark = get_spark(f"scale-{cores}", cores=cores,
                      shuffle_partitions=max(32, cores * 2))
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(CORPUS)
    n = src.count()

    def one() -> float:
        t0 = time.perf_counter()
        pipeline.extract_conversations(
            src, pipeline.Options(salt_block=512)
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    one()  # warm-up: python worker pool spin-up
    one()  # warm-up: JIT + page cache steady state
    times = [one() for _ in range(n_runs)]
    med = statistics.median(times)
    out = {
        "cores": cores,
        "n_turns": n,
        "times_sec": [round(t, 2) for t in times],
        "median_sec": round(med, 2),
        "turns_per_sec": round(n / med),
    }
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "RUN":
        print("RESULT " + json.dumps(measured_run(int(sys.argv[2]), 1)))
        return

    build_corpus()

    def one_run(cores: int) -> dict:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "RUN", str(cores)],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
            timeout=1800,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(proc.stdout[-2000:], proc.stderr[-2000:])
            raise SystemExit(f"run at {cores} cores failed")
        return json.loads(line[-1][len("RESULT "):])

    # interleave cluster sizes per measurement round so shared-machine noise
    # drifts hit both sizes alike (a block design would attribute a noisy
    # window entirely to one size — observed: one run measured "efficiency"
    # 1.22, which is not physical)
    samples: dict[int, list[dict]] = {8: [], 32: []}
    for _ in range(3):
        for cores in (8, 32):
            samples[cores].append(one_run(cores))
            print(json.dumps(samples[cores][-1]))
    results = {}
    for cores in (8, 32):
        times = sorted(t for s in samples[cores] for t in s["times_sec"])
        med = times[len(times) // 2]
        results[cores] = {
            "cores": cores,
            "n_turns": samples[cores][0]["n_turns"],
            "times_sec": times,
            "median_sec": round(med, 2),
            "turns_per_sec": round(samples[cores][0]["n_turns"] / med),
        }

    eff = results[32]["turns_per_sec"] / results[8]["turns_per_sec"] / 4.0
    # paired per-round efficiencies (VERDICT r4 #7 — the huge_pdf_chunked
    # methodology): round i's local[8] and local[32] runs are adjacent in
    # time, so each ratio saw the same host weather and is load-independent
    # even if the machine drifts across rounds
    paired_effs = [
        round(
            statistics.median(s8["times_sec"])
            / statistics.median(s32["times_sec"])
            / 4.0,
            3,
        )
        for s8, s32 in zip(samples[8], samples[32])
    ]
    md = f"""# BENCH/BASELINE.md — two-cluster-size scaling evidence

North rule: throughput scaling efficiency >= 0.8 between cluster sizes N and
4N. Sandbox proxy (no real cluster): identical job + identical input at
local[8] vs local[32].

Job: parquet scan -> mapInPandas extraction kernels -> salted ordered
conversation concat -> noop sink, over {results[8]['n_turns']:,} transcript
turns (deterministic corpus incl. 56 skewed 4,000-turn conversations).
Interleaved design: 3 alternating (N, 4N) measurement rounds, each a fresh
session with 2 warm-ups (worker spin-up + JIT excluded); median over the
pooled samples per size — shared-machine noise drifts hit both sizes alike.

| cluster size | cores | median wall (s) | throughput (turns/s) |
|---|---|---|---|
| N | 8 | {results[8]['median_sec']} | {results[8]['turns_per_sec']:,} |
| 4N | 32 | {results[32]['median_sec']} | {results[32]['turns_per_sec']:,} |

**Scaling efficiency = (tput_32 / tput_8) / 4 = {eff:.3f}**
(target >= 0.8 — {"PASS" if eff >= 0.8 else "FAIL"})

Paired per-round efficiencies (each round's N / 4N runs adjacent in time,
so both sides of each ratio saw the same host weather):
{paired_effs} — min {min(paired_effs)}, every round independently
{"clears" if min(paired_effs) >= 0.8 else "DOES NOT clear"} the 0.8 bar.

Raw timings: local[8] {results[8]['times_sec']}, local[32] {results[32]['times_sec']}.

Reference single-node anchor (BASELINE.md): pdf-parse-new reaches 3.36x on
24 cores vs sequential on its 9,924-page document (CHANGELOG.md:150-157);
its scaling sink — every child re-parses the full document — does not exist
here because payloads are per-row.
"""
    os.makedirs("BENCH", exist_ok=True)
    # BENCH/BASELINE.md is hand-curated (run history + honest-read notes):
    # write the raw result to a sidecar and fold it in manually
    with open("BENCH/SCALING_LATEST.md", "w") as f:
        f.write(md)
    with open("BENCH/scaling_latest.json", "w") as f:
        json.dump({"results": {str(k): v for k, v in results.items()},
                   "efficiency": round(eff, 3),
                   "paired_efficiencies": paired_effs,
                   "paired_efficiency_min": min(paired_effs)}, f, indent=1)
    print(md)


if __name__ == "__main__":
    main()
