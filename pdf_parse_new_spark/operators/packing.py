"""Sequence packing: assign documents to fixed-token-budget training
sequences.

The operator a pretraining pipeline runs right before tokenized shards
are written: documents are concatenated in a stable order and cut into
fixed-length sequences (the GPT-style pack; documents may straddle a
sequence boundary). The assignment here is purely arithmetic — each
document's starting token offset within its shard determines its pack —
so it is deterministic under re-runs and re-partitioning, and the DuckDB
oracle can reproduce it with window functions (driver query
``doc_pack``).

Scale notes (100 TB): the only shuffle is the repartition-by-shard that
feeds one window per shard (cumulative token sum ordered by doc id). A
shard is the packing unit real pipelines already have (a shard file /
Iceberg partition); choosing thousands of shards keeps every window's
sort executor-sized, and shards pack independently — no global ordering
or driver-side state at any scale. The reference has no packing analog
(it stops at per-document extraction); this is part of the
training-data operator family layered on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_bucket(col: Column, mod: int) -> Column:
    """Content-independent bucket from the first 8 hex digits of
    md5(id) — identical arithmetic on Spark and DuckDB (shared with the
    deterministic train/val/test split)."""
    hexs = F.substring(F.md5(col.cast("string").cast("binary")), 1, 8)
    return F.conv(hexs, 16, 10).cast("bigint") % mod


def pack_sequences(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    shard_col: str | None = None,
    n_shards: int = 8,
) -> DataFrame:
    """(doc, shard, start_tok, pack_id, pack_offset, n_spans): documents
    fill ``budget``-token sequences in ``order_col`` order within a
    shard. ``start_tok`` is the document's first token's offset in the
    shard's concatenated stream; ``pack_id`` = start_tok // budget;
    ``pack_offset`` = start_tok % budget; ``n_spans`` counts how many
    sequences the document straddles (1 for most, >1 for documents
    longer than the remaining room — boundaries cut through documents,
    as in standard pretraining packing)."""
    if shard_col is None:
        df = df.withColumn("shard", md5_bucket(F.col(order_col), n_shards))
        shard_col = "shard"
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("bigint")
    out = df.withColumn("start_tok", start)
    # integer DIV, not float-divide-then-cast: exact at any offset
    end_tok = (
        f"start_tok + greatest(cast({tokens_col} AS bigint), 1L) - 1L"
    )
    return out.select(
        order_col,
        shard_col,
        tokens_col,
        "start_tok",
        F.expr(f"start_tok DIV {budget}").alias("pack_id"),
        (F.col("start_tok") % budget).alias("pack_offset"),
        F.expr(
            f"({end_tok}) DIV {budget} - start_tok DIV {budget} + 1L"
        ).alias("n_spans"),
    )
