"""Structured Streaming front-end for the extraction pipeline.

The reference engine is batch-only (its "stream" strategy is memory-chunked
batch, lib/pdf-parse-stream.js:40-44), so this module is an *extension*, not
parity: it lets the same kernels run over a continuously-arriving transcript
table (e.g. a Kafka topic or files landing in object storage).

Design:
- the per-turn extraction operator is reused verbatim — ``mapInPandas`` works
  identically on streaming DataFrames;
- per-conversation concat is NOT attempted in-stream (conversations are
  unbounded); instead ``foreachBatch`` feeds each micro-batch through the
  same checkpointed incremental commit as batch runs, so batch and streaming
  share one idempotent sink;
- ``error_rate_stream`` shows the watermarked windowed-aggregation shape for
  monitoring (event-time window on ``ts``, late data bounded by the
  watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parse_new_spark.operators import extract


def streaming_extract_turns(stream_df: DataFrame,
                            kernel: str | None = None) -> DataFrame:
    """Per-turn extraction over a streaming transcripts DataFrame."""
    return extract.extract_turns(stream_df, kernel=kernel)


def error_rate_stream(stream_df: DataFrame, window: str = "5 minutes",
                      watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window extraction error rate per payload family.

    Event time rides through the extraction operator via ``passthrough`` —
    no stream-stream re-join needed."""
    extracted = extract.extract_turns(stream_df, passthrough=("ts",))
    return (
        extracted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "family")
        .agg(
            F.count("*").alias("n"),
            F.count("error").alias("n_errors"),
        )
    )


def run_stream_to_checkpointed_table(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    kernel: str | None = None,
    trigger_seconds: int = 30,
):
    """Start a stream writing per-turn extraction results through the same
    idempotent snapshot-commit sink the batch path uses (exactly-once via
    Spark's streaming checkpoint + our conv_id anti-join)."""
    from pdf_parse_new_spark.sources import checkpoint as ckpt

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ckpt.run_incremental(batch_df.sparkSession, batch_df, out_dir,
                             kernel=kernel)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def dedup_stream(
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    key: str = "fingerprint",
) -> DataFrame:
    """Streaming exact-dedup within the watermark horizon: emit each
    document fingerprint's FIRST arrival, drop re-arrivals while state for
    that key is retained. Uses ``dropDuplicatesWithinWatermark`` — the
    state-store API that evicts expired keys even when the dedup key is
    NOT the event-time column (plain ``dropDuplicates([key])`` only
    evicts when the event-time column is part of the subset, so its
    state would grow without bound at 100 TB/day ingest).

    The key defaults to the extraction fingerprint of the turn text (the
    same strided min-hash the batch dedup family uses), so batch and
    streaming share one notion of "same document". Web-scale shape: state
    lives in the streaming state store partitioned by key; re-partitioning
    is Spark-managed, no driver state."""
    from pdf_parse_new_spark.operators import textstats

    extracted = extract.extract_turns(stream_df, passthrough=("ts",))
    keyed = (
        extracted.filter(F.col("error").isNull())
        .withColumn(key, textstats.fingerprint(F.col("extracted_text")))
        .filter(F.col(key).isNotNull())
    )
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [key]
    )


def near_dedup_stream(
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    k: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Streaming NEAR-dup suppression: the batch MinHash machinery's
    signature as the dedup key, state bounded by the watermark via
    ``dropDuplicatesWithinWatermark`` (the state-store-backed API — unlike
    ``dropDuplicates``, expired keys are evicted even though the key is
    not the event-time column).

    Semantics: two documents collapse when their FULL k-hash MinHash
    signatures are equal — for k=16 that concentrates around Jaccard
    ~> 0.9 (P[all k agree] = J^k), i.e. near-identical boilerplate
    re-arrivals (the dominant streaming-ingest case: the same article
    re-crawled with a tracking-parameter tweak hashes to the same
    shingle set). Banded OR-semantics (any band collision, the batch
    ``minhash_dedup_pairs`` rule) needs a second stateful operator over
    the first's output; chain :func:`band_collision_stream` after this
    when candidate FLAGGING rather than suppression is wanted.

    Web-scale shape: signature computed JVM-side from the same
    ``dedup.minhash_signature`` expressions as the batch path (one
    notion of "near-same" across both), state partitioned by signature
    in the streaming state store, no driver state."""
    from pdf_parse_new_spark.operators import dedup

    extracted = extract.extract_turns(stream_df, passthrough=("ts",))
    keyed = (
        extracted.filter(F.col("error").isNull())
        .filter(F.length("extracted_text") > 0)
        .withColumn(
            "minhash_sig",
            F.array_join(
                dedup.minhash_signature(
                    F.col("extracted_text"), k=k, shingle_n=shingle_n
                ).cast("array<string>"),
                "-",
            ),
        )
        .filter(F.col("minhash_sig").isNotNull())
    )
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["minhash_sig"]
    )


def band_collision_stream(
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    k: int = 16,
    bands: int = 4,
    window: str = "5 minutes",
) -> DataFrame:
    """Banded near-dup candidate METRICS over a stream: explode each
    document's LSH band keys, keep first arrival per (band_idx, key)
    within the watermark, then window-count surviving bands per event-time
    window — two chained stateful operators (dedup -> windowed agg),
    supported in append mode on Spark 4. A window where
    ``n_first_seen_bands`` is much lower than ``bands *
    n_docs`` is ingesting mostly near-duplicates; the batch
    ``minhash_dedup_pairs`` then owns exact pair extraction. Emits on
    watermark expiry (append mode)."""
    from pdf_parse_new_spark.operators import dedup

    extracted = extract.extract_turns(stream_df, passthrough=("ts",))
    rows = max(1, k // bands)
    banded = (
        extracted.filter(F.col("error").isNull())
        .filter(F.length("extracted_text") > 0)
        .select(
            "ts",
            F.explode(
                dedup.minhash_bands(
                    dedup.minhash_signature(F.col("extracted_text"), k=k),
                    bands=bands, rows=rows,
                )
            ).alias("band_key"),  # struct<band:int, bh:bigint>
        )
    )
    first_seen = banded.withWatermark(
        "ts", watermark
    ).dropDuplicatesWithinWatermark(["band_key"])
    return (
        first_seen.groupBy(F.window("ts", window))
        .agg(F.count("*").alias("n_first_seen_bands"))
    )
