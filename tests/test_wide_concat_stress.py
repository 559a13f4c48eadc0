"""Wide-concat tail stress (VERDICT r3 next-round #4): a single
>=10^6-turn conversation must complete END-TO-END under a CAPPED-MEMORY
session, with the planner's TREE_FANOUT_AT auto-upgrade producing the
three-level tree shape (block partials -> superblocks -> final) so the
final reducer's collect_list stays bounded no matter how long one
conversation grows.

Runs in a SUBPROCESS so the driver-memory cap actually applies (the
shared test JVM is already up with default memory)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import json, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession, functions as F
from pdf_parse_new_spark import pipeline
from pdf_parse_new_spark.plans import planner

spark = (
    SparkSession.builder.master("local[8]")
    .appName("wide-concat-stress")
    .config("spark.driver.memory", "1200m")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
N = 1_050_000
df = spark.range(N, numPartitions=32).select(
    F.lit("megaconv").alias("conv_id"),
    F.col("id").cast("int").alias("turn_idx"),
    F.lit("assistant").alias("role"),
    F.concat(
        F.lit("turn "), F.format_string("%%07d", F.col("id")),
        F.lit(" payload alpha beta gamma"),
    ).alias("text"),
    F.lit(None).cast("string").alias("tool"),
)

# planner probe must demand the tree at this block size:
# 1_050_000 / 128 blocks = 8203 > TREE_FANOUT_AT (4096)
opts = pipeline.Options(salt_block=128)
out = pipeline.extract_conversations_planned(df, opts)
plan = out._jdf.queryExecution().optimizedPlan().toString()
# tree shape: THREE aggregate levels over (conv_id, salt),
# (conv_id, salt2->o2), (conv_id)
n_aggs = plan.count("Aggregate [")
rows = out.collect()
r = rows[0]
probe_plan = planner.make_plan(df)
print(json.dumps({
    "n_rows": len(rows),
    "n_turns": r.n_turns,
    "n_extracted": r.n_extracted,
    "n_errors": r.n_errors,
    "text_len": len(r.full_text),
    "head": r.full_text[:60],
    "tail": r.full_text[-40:],
    "n_aggs": n_aggs,
    "has_salt2": "salt2" in plan or "o2" in plan,
    "max_conv_turns": probe_plan.max_conv_turns,
}))
spark.stop()
"""


def test_megaconversation_tree_concat_capped_memory(tmp_path):
    script = tmp_path / "stress.py"
    script.write_text(SCRIPT % {"repo": REPO})
    res = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True, timeout=900,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    n = 1_050_000
    assert out["n_rows"] == 1
    assert out["n_turns"] == n and out["n_extracted"] == n
    assert out["n_errors"] == 0
    assert out["max_conv_turns"] == n
    # deterministic text: every turn contributes
    # "turn NNNNNNN payload alpha beta gamma" joined by "\n\n"
    piece = len("turn 0000000 payload alpha beta gamma")
    assert out["text_len"] == n * piece + (n - 1) * 2
    assert out["head"].startswith("turn 0000000 payload alpha beta gamma")
    assert out["tail"].endswith("turn 1049999 payload alpha beta gamma")
    # the planner auto-upgrade produced the three-level tree
    assert out["n_aggs"] >= 3, out
    assert out["has_salt2"], out
