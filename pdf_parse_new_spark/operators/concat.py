"""Ordered conversation concat — the reference's page-join aggregations.

Semantics (reference lib/pdf-parse.js):
- turns join with "\\n\\n" in stable turn order (A1/A2, :126/:134);
- ``leading_separator=True`` reproduces sequential mode's leading "\\n\\n"
  (:134 — the golden .txt files begin with two newlines);
- ``max_turns`` keeps the first N turns; <=0 means all; ``n_extracted``
  reports the clamp while ``n_turns`` reports the full count (:98-99,138).

Scale design: the naive plan is one groupBy(conv_id) — a single reducer per
conversation, which dies on the skew tail (one conv with 10^6 turns). The
salted variant runs a two-level ordered aggregation: partial concat per
(conv_id, turn_idx // block) — map-side-combinable, bounded state — then a
final concat of the ordered partials. Join with "\\n\\n" is associative, so
partial+final equals the direct fold (the exact shape of the reference's
child/parent partial joins, lib/pdf-child.js:104 + pdf-parse-processes.js:108).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pdf_parse_new_spark import spec

_SEP = spec.PAGE_SEP


def _ordered_join(turn_col: str, text_col: str) -> Column:
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(turn_col, text_col))),
            lambda s: s[text_col],
        ),
        _SEP,
    )


def _finish(df: DataFrame, leading_separator: bool) -> DataFrame:
    if leading_separator:
        # sequential-mode parity: prepend only when something was extracted
        df = df.withColumn(
            "full_text",
            F.when(
                F.col("n_extracted") > 0, F.concat(F.lit(_SEP), F.col("full_text"))
            ).otherwise(F.col("full_text")),
        )
    return df.select(
        "conv_id",
        F.col("n_turns").cast("int").alias("n_turns"),
        F.col("n_extracted").cast("int").alias("n_extracted"),
        "full_text",
        F.col("n_errors").cast("long").alias("n_errors"),
    )


def concat_conversations(
    extracted: DataFrame,
    leading_separator: bool = False,
    max_turns: int = 0,
) -> DataFrame:
    """Direct one-level ordered concat (fine when conversations are short).

    ``max_turns`` filters ``turn_idx < N`` — identical to "first N turns"
    under the input_hint's dense 0-based turn_idx contract, and identical to
    the salted variant's clamp on any input (verified by tests).
    """
    w = Window.partitionBy("conv_id")
    df = extracted.withColumn("n_turns", F.count("*").over(w))
    if max_turns > 0:
        df = df.filter(F.col("turn_idx") < max_turns)
    out = df.groupBy("conv_id").agg(
        F.first("n_turns").alias("n_turns"),
        F.count("*").alias("n_extracted"),
        _ordered_join("turn_idx", "extracted_text").alias("full_text"),
        F.count("error").alias("n_errors"),
    )
    return _finish(out, leading_separator)


def concat_conversations_salted(
    extracted: DataFrame,
    block: int = 1024,
    leading_separator: bool = False,
    max_turns: int = 0,
) -> DataFrame:
    """Two-level skew-proof concat. Assumes dense 0-based ``turn_idx`` (the
    input_hint contract) so the ``max_turns`` clamp is ``turn_idx < N`` and
    the salt is ``turn_idx // block`` — each partial holds <= block turns
    regardless of conversation length."""
    df = extracted
    counted = df.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    if max_turns > 0:
        df = df.filter(F.col("turn_idx") < max_turns)
    partial = df.withColumn(
        "salt", (F.col("turn_idx") / F.lit(block)).cast("long")
    ).groupBy("conv_id", "salt").agg(
        F.count("*").alias("pn"),
        _ordered_join("turn_idx", "extracted_text").alias("ptext"),
        F.count("error").alias("perr"),
    )
    out = (
        partial.groupBy("conv_id")
        .agg(
            F.sum("pn").cast("int").alias("n_extracted"),
            _ordered_join("salt", "ptext").alias("full_text"),
            F.sum("perr").cast("long").alias("n_errors"),
        )
        .join(counted, "conv_id")
        .select("conv_id", "n_turns", "n_extracted", "full_text", "n_errors")
    )
    return _finish(out, leading_separator)
