"""Checkpointed, idempotent extraction runs (north rule: "resumes
idempotently from the last committed snapshot checkpoint").

Model: the output directory is an Iceberg-style table of per-turn extraction
results plus a ``_commits/`` log. A run:

1. loads the set of already-committed ``conv_id``s from the commit log's
   data files (the committed snapshot);
2. anti-joins the input on ``conv_id`` — only unprocessed conversations are
   re-extracted (the reference's analog: the benchmark collector re-saves
   incrementally after every file and skips finished ones on restart,
   benchmark/collect-benchmarks.js:199-223);
3. appends results atomically (Spark parquet job commit) and then records
   the commit manifest. A crash before the manifest write leaves orphaned
   data files that the next run ignores (manifest-listed files only), so
   re-running is always safe — same semantics as an Iceberg snapshot commit.

On a real deployment this maps 1:1 onto ``df.writeTo(tbl).append()`` with
Iceberg snapshot IDs; parquet + a JSON commit log keeps the sandbox
dependency-free.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parse_new_spark.operators import extract
from pdf_parse_new_spark.sources import lineage


def _commit_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_commits")


def committed_files(out_dir: str) -> list[dict]:
    cd = _commit_dir(out_dir)
    if not os.path.isdir(cd):
        return []
    commits = []
    for name in sorted(os.listdir(cd)):
        if name.endswith(".json"):
            with open(os.path.join(cd, name)) as f:
                commits.append(json.load(f))
    return commits


def committed_data_paths(out_dir: str, as_of: str | None = None) -> list[str]:
    paths: list[str] = []
    seen = False
    for c in committed_files(out_dir):
        if c.get("replaces_all"):
            # compaction snapshot: its files ARE the whole table here
            paths = list(c["data_dirs"])
        else:
            paths.extend(c["data_dirs"])
        if as_of is not None and c["snapshot_id"] == as_of:
            seen = True
            break
    if as_of is not None and not seen:
        raise ValueError(f"unknown snapshot_id {as_of!r} in {out_dir}")
    return [p for p in paths if os.path.isdir(p)]


def snapshots(out_dir: str) -> list[dict]:
    """The Iceberg ``snapshots`` metadata-table analog: one row per commit,
    in commit order, with the cumulative row count readable at that
    snapshot (commit filenames are timestamp-prefixed, so sorted order IS
    commit order). A compaction snapshot restates the full table, so the
    cumulative count resets to its row count."""
    out, total = [], 0
    for c in committed_files(out_dir):
        total = c["n_rows"] if c.get("replaces_all") else total + c["n_rows"]
        out.append({
            "snapshot_id": c["snapshot_id"],
            "committed_at": c["committed_at"],
            "n_rows": c["n_rows"],
            "cumulative_rows": total,
            "n_convs": c["n_convs"],
            "compaction": bool(c.get("replaces_all")),
        })
    return out


def read_committed(
    spark: SparkSession, out_dir: str, as_of: str | None = None
) -> DataFrame | None:
    """Read the committed table, optionally TIME-TRAVELLED to the state as
    of a historical snapshot id (inclusive) — the Iceberg
    ``VERSION AS OF`` analog: later snapshots' data files are simply not
    listed, so the read reconstructs exactly the rows visible at that
    commit. Raises on an unknown snapshot id."""
    paths = committed_data_paths(out_dir, as_of=as_of)
    if not paths:
        return None
    # mergeSchema: snapshots may span ENGINE versions (e.g. the per-turn
    # `info` column landed in round 2) — without it Spark samples one file's
    # footer for the schema and resumes nondeterministically fail/succeed
    # depending on which snapshot it sampled (Iceberg gets this from table
    # metadata; plain parquet needs the explicit merge)
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def compact(
    spark: SparkSession, out_dir: str, partitions: int | None = None
) -> dict:
    """Compaction (Iceberg ``rewrite_data_files`` analog): rewrite the whole
    committed table into ONE fresh snapshot whose manifest carries
    ``replaces_all`` — subsequent reads list only it, so the many small
    per-commit file sets an incremental 100-TB ingest accumulates collapse
    to one well-sized layout. History stays intact: earlier snapshots'
    files are untouched, so time travel to them keeps working until
    ``expire_snapshots`` reclaims them. Resumes are unaffected — the
    anti-join reads through the same committed view."""
    done = read_committed(spark, out_dir)
    if done is None:
        return {"snapshot_id": None, "n_rows": 0, "skipped": True}
    snap_id = f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
    data_dir = os.path.join(out_dir, f"data-compact-{snap_id}")
    w = done.repartition(partitions) if partitions else done
    w.write.mode("overwrite").parquet(data_dir)
    written = spark.read.parquet(data_dir)
    commit = {
        "snapshot_id": snap_id,
        "data_dirs": [data_dir],
        "replaces_all": True,
        "n_rows": written.count(),
        "n_convs": int(written.select("conv_id").distinct().count()),
        "n_errors": 0,
        "partitions": [],
        "committed_at": time.time(),
    }
    tmp = os.path.join(_commit_dir(out_dir), f".{snap_id}.json.tmp")
    final = os.path.join(_commit_dir(out_dir), f"{snap_id}.json")
    with open(tmp, "w") as f:
        json.dump(commit, f, indent=1)
    os.rename(tmp, final)  # atomic commit point
    return commit


def expire_snapshots(out_dir: str) -> list[str]:
    """Reclaim history superseded by the latest compaction (Iceberg
    ``expire_snapshots`` analog): drop every commit BEFORE the newest
    ``replaces_all`` snapshot and delete their data directories. Time
    travel to expired snapshots is gone by design; the current table and
    every later snapshot are untouched. No-op when nothing was
    compacted."""
    import shutil

    commits = committed_files(out_dir)
    last_base = max(
        (i for i, c in enumerate(commits) if c.get("replaces_all")),
        default=None,
    )
    if last_base is None:
        return []
    keep_dirs = {d for c in commits[last_base:] for d in c["data_dirs"]}
    removed = []
    for c in commits[:last_base]:
        for d in c["data_dirs"]:
            if d not in keep_dirs and os.path.isdir(d):
                shutil.rmtree(d)
        os.remove(os.path.join(_commit_dir(out_dir),
                               f"{c['snapshot_id']}.json"))
        removed.append(c["snapshot_id"])
    return removed


def run_incremental(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    kernel: str | None = None,
    partitions: int | None = None,
) -> dict:
    """Extract only conversations absent from the committed snapshot; append
    + commit. Returns the commit manifest (or a no-op marker)."""
    os.makedirs(_commit_dir(out_dir), exist_ok=True)
    todo = transcripts
    done = read_committed(spark, out_dir)
    if done is not None:
        committed_ids = done.select("conv_id").distinct()
        todo = transcripts.join(committed_ids, "conv_id", "anti")

    snap_id = f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
    data_dir = os.path.join(out_dir, f"data-{snap_id}")
    extracted = extract.extract_turns(
        todo, kernel=kernel, partitions=partitions, with_lineage=True
    )
    extracted.write.mode("overwrite").parquet(data_dir)

    written = spark.read.parquet(data_dir)
    manifest = lineage.partition_manifest(written)
    n_rows = sum(m["n_rows"] for m in manifest)
    commit = {
        "snapshot_id": snap_id,
        "data_dirs": [data_dir],
        "n_rows": n_rows,
        "n_convs": int(written.select("conv_id").distinct().count()),
        "n_errors": sum(m["n_errors"] for m in manifest),
        "partitions": manifest,
        "committed_at": time.time(),
    }
    if n_rows == 0:
        # nothing new: do not commit an empty snapshot (idempotent re-run)
        return {"snapshot_id": None, "n_rows": 0, "skipped": True}
    tmp = os.path.join(_commit_dir(out_dir), f".{snap_id}.json.tmp")
    final = os.path.join(_commit_dir(out_dir), f"{snap_id}.json")
    with open(tmp, "w") as f:
        json.dump(commit, f, indent=1)
    os.rename(tmp, final)  # atomic commit point
    return commit
