"""Driver-contract surface: entry() + queries()/oracle_sql() integrity.
(The full value comparison runs in scripts/check_oracle.py; this guards the
shape so refactors can't silently break the graded surface.)"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

CHEAP = [
    "conv_concat",
    "group_limit",
    "lang_quality",
    "dup_groups",
    "tpch_pricing",
    "top_customers",
    "knn_cosine",
    "part_stats",
    "events_user_span",
    "orders_monthly",
    "asof_join",
    "range_join",
    "unigram_ll",
    "source_mix",
    "lexical_diversity",
    "events_windowed",
    "length_quantiles",
    "domain_stats",
    "repeated_ngrams",
    "orders_rollup",
    "events_pivot",
    "customer_quartiles",
    "bm25_topk",
    "token_entropy",
    "url_dedup",
    "outlier_docs",
    "inverted_index",
]


def test_entry_runs_and_has_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "conv_id", "n_turns", "n_extracted", "full_text", "n_errors", "meta"
    }


def test_contract_key_integrity():
    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    assert set(oq) <= set(qs)
    assert len(oq) >= 21
    assert len(qs) >= 27
    # every oracle is a non-empty SQL string mentioning a known table
    tables = ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "nation", "region", "part", "supplier")
    for name, sql in oq.items():
        assert any(t in sql for t in tables), name


@pytest.mark.parametrize("name", CHEAP)
def test_cheap_queries_return_rows(spark, name):
    df = entrymod.queries()[name](spark, SF)
    assert df.count() > 0


def test_sql_function_registry(spark, smoke_df):
    from pdf_parse_new_spark import oracle
    from pdf_parse_new_spark.functions import register_all

    register_all(spark)
    smoke_df.createOrReplaceTempView("transcripts_sql")
    rows = spark.sql(
        "SELECT conv_id, turn_idx, text, extract_text(text) AS t, "
        "extract_error(text) AS e, payload_family(text) AS f "
        "FROM transcripts_sql"
    ).collect()
    assert rows
    for r in rows[:50]:
        ex = oracle.extract(r.text)
        assert r.t == ex.text and r.e == ex.error and r.f == ex.family


def test_lang_id_expr_matches_udf(spark):
    from pyspark.sql import functions as F

    from pdf_parse_new_spark.operators import textstats

    d = spark.read.parquet(f"{SF}/documents.parquet")
    both = d.select(
        textstats.lang_id_udf(F.col("text")).alias("udf"),
        textstats.lang_id_expr(F.col("text")).alias("expr"),
    ).collect()
    agree = sum(1 for r in both if r.udf == r.expr)
    # the UDF counts substring hits, the expression counts exact tokens —
    # they agree on this corpus (single-space separated words)
    assert agree == len(both)


def test_sql_pdf_functions(spark):
    from pdf_parse_new_spark.functions import register_all

    register_all(spark)
    (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load("/root/reference/test/data")
        .createOrReplaceTempView("raw_pdfs")
    )
    rows = spark.sql(
        "SELECT path, pdf_numpages(content) AS np, pdf_text(content) AS t "
        "FROM raw_pdfs"
    ).collect()
    by = {r.path.rsplit("/", 1)[-1]: r for r in rows}
    assert by["01-valid.pdf"].np == 14
    assert "Because traces are in SSA form" in by["01-valid.pdf"].t
    assert by["03-invalid.pdf"].t is None  # rejected doc -> NULL
