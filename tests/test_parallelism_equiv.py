"""Cross-parallelism equivalence (reference asserts default ≡ workers ≡
processes output, test/examples/09-custom-render.js:90-98; north rule asks
for byte-identical output at any partition count / cluster size).

A second SparkSession at a different core count inside one JVM isn't
possible, so partition-count equivalence (the thing that actually varies
between cluster sizes) is asserted here, and true local[8]-vs-local[32]
process-level equality is asserted by scripts/scaling_bench.py runs +
test_pipeline goldens being independent of the session fixture's core count.
"""

from __future__ import annotations

from pdf_parse_new_spark import pipeline
from pdf_parse_new_spark.operators import extract


def _snapshot(df):
    return sorted(
        (r.conv_id, r.n_turns, r.n_extracted, r.full_text, r.n_errors)
        for r in df.collect()
    )


def test_output_independent_of_partitioning(spark, smoke_df):
    base = _snapshot(pipeline.extract_conversations(smoke_df))
    for parts in (1, 3, 17):
        opts = pipeline.Options(partitions=parts, salt_block=5)
        assert _snapshot(pipeline.extract_conversations(smoke_df, opts)) == base


def test_turn_output_independent_of_partitioning(spark, smoke_df):
    a = {
        (r.conv_id, r.turn_idx): r.extracted_text
        for r in extract.extract_turns(smoke_df, partitions=2).collect()
    }
    b = {
        (r.conv_id, r.turn_idx): r.extracted_text
        for r in extract.extract_turns(smoke_df, partitions=23).collect()
    }
    assert a == b


def test_passthrough_columns(spark, smoke_df):
    out = extract.extract_turns(smoke_df, passthrough=("ts", "tool"))
    row = out.first()
    assert hasattr(row, "ts") and hasattr(row, "tool")
    assert out.count() == smoke_df.count()
