"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``: flagship extraction pipeline — derives a transcripts table
from the sf0.001 ``documents`` parquet (each document becomes a turn of a
per-source conversation) and runs per-conversation main-content extraction
(kernel dispatch -> salted ordered concat), returning one row per
conversation.

``queries()`` / ``oracle_sql()``: see pdf_parse_new_spark/queries.py —
exactly 50 driver-registered DuckDB-checked queries (the harness records at
most 50 CORRECTNESS rows; two redundant twins — conv_concat_tree and
lang_id — are retired from driver registration but stay oracle-verified
locally via queries.SQL_CHECKED_ALL / scripts/check_oracle.py /
tests/test_oracle_local.py) covering SURVEY §2 operator families plus the
training-data extensions (incl. the exact prefix-filtered Jaccard and
containment joins, whose all-pairs DuckDB twins double as losslessness
proofs; dup_clusters: alternating-star connected components over the
near-dup edge set vs a recursive-CTE closure; repetition: Gopher-style
repetition quality filters; decontaminate: eval-set n-gram leakage
flagging; doc_split: deterministic hash-bucket train/val/test
assignment; doc_pack: fixed-token-budget sequence packing vs the same
window arithmetic in DuckDB; asof_join: the temporal as-of join in the
union-window shape, no join operator; range_join: interval-bucketed band
join; unigram_ll: corpus LM scoring; source_mix: deterministic
data-mixing rebalance; lexical_diversity: TTR/hapax quality signals;
events_windowed: the epoch-aligned tumbling-window rollup;
length_quantiles: exact per-source percentiles; domain_stats: per-domain
URL rollup; repeated_ngrams: cross-document repeated 8-gram spans, the
Lee-et-al exact-substring-dedup signal; orders_rollup: one-pass ROLLUP
subtotals; events_pivot: long-to-wide pivot; customer_quartiles: ntile
bucketing; bm25_topk: BM25 retrieval, the search twin of tfidf_topk;
token_entropy: token-distribution Shannon entropy quality signal;
url_dedup: canonical-URL crawl dedup with stable keeper election;
outlier_docs: per-source robust-stats anomaly flags; inverted_index:
bounded posting-list build over the mid-frequency bigram band), and 10
rows-only entries for the non-SQL extraction/LSH kernels
(incl. real_pdf_corpus: the reference's own binary PDF test corpus
through the real-dialect parser; real_pdf_files: path/URL ingest with
task-side reads; real_pdf_chunked: page-range intra-document
parallelism), each with a written justification in its docstring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Input = the sf0.001 ``documents`` parquet lifted into transcript turns
    (plain-text family) UNION a small deterministic synthetic corpus
    (mini-PDF content streams, HTML boilerplate, corrupt payloads), so the
    flagship run exercises every extraction kernel plus the salted ordered
    concat."""
    from pyspark.sql import Window

    from pdf_parse_new_spark import fixtures, pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rn = F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    doc_turns = docs.select(
        F.col("source").alias("conv_id"),
        (rn - 1).alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
    )
    synth = fixtures.make_transcripts_df_dist(
        spark, n_convs=20, median_turns=8, skew_convs=1, skew_turns=60,
        partitions=4,
    )
    return pipeline.extract_conversations(
        doc_turns.unionByName(synth), pipeline.Options(salt_block=64)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdf_parse_new_spark import queries as q

    out = {name: fn for name, (fn, _) in q.SQL_CHECKED.items()}
    out.update(q.ROWS_ONLY)
    return out


def oracle_sql() -> dict[str, str]:
    from pdf_parse_new_spark import queries as q

    return {name: sql for name, (_, sql) in q.SQL_CHECKED.items()}
