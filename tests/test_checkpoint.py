"""Checkpoint/resume, lineage manifests, and the stats-probe planner."""

from __future__ import annotations

import shutil
import tempfile

from pdf_parse_new_spark import fixtures
from pdf_parse_new_spark.operators import extract
from pdf_parse_new_spark.plans import planner
from pdf_parse_new_spark.sources import checkpoint, lineage


def test_incremental_resume(spark):
    out = tempfile.mkdtemp(prefix="ckpt-")
    try:
        df1 = fixtures.make_transcripts_df(spark, n_convs=6, median_turns=5)
        c1 = checkpoint.run_incremental(spark, df1, out)
        assert c1["n_rows"] == df1.count()
        assert c1["n_convs"] == 6
        assert len(c1["partitions"]) >= 1

        # identical re-run: idempotent no-op (no second snapshot)
        c2 = checkpoint.run_incremental(spark, df1, out)
        assert c2.get("skipped") is True
        assert len(checkpoint.committed_files(out)) == 1

        # grow the input: only the 4 new conversations are processed
        df2 = fixtures.make_transcripts_df(spark, n_convs=10, median_turns=5)
        c3 = checkpoint.run_incremental(spark, df2, out)
        assert c3["n_convs"] == 4
        total = checkpoint.read_committed(spark, out)
        assert total.count() == df2.count()
        assert total.select("conv_id").distinct().count() == 10
        # committed rows byte-match a fresh full extraction
        fresh = {
            (r.conv_id, r.turn_idx): r.extracted_text
            for r in extract.extract_turns(df2).collect()
        }
        for r in total.collect():
            assert fresh[(r.conv_id, r.turn_idx)] == r.extracted_text
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_lineage_manifest_totals(spark, smoke_df):
    ext = extract.extract_turns(smoke_df, with_lineage=True)
    manifest = lineage.partition_manifest(ext)
    assert sum(m["n_rows"] for m in manifest) == smoke_df.count()
    assert all(m["kernel_ms"] >= 0 for m in manifest)
    stats = {r.family: r for r in lineage.run_stats(ext).collect()}
    assert stats["corrupt"].n_errors == stats["corrupt"].n
    assert stats["plain"].n_errors == 0


def test_planner_probe_and_tiers(spark, smoke_df):
    plan = planner.make_plan(smoke_df, cores=8)
    assert plan.n_rows == smoke_df.count()
    assert plan.max_conv_turns == 200  # the skew conv
    assert plan.partitions >= 8
    assert plan.arrow_batch >= 256
    # tiny tier: salt block collapses to the biggest conversation
    assert plan.salt_block == 200
    planner.apply_plan(spark, plan)
    assert spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch") == str(
        plan.arrow_batch
    )
