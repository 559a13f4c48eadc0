"""Text-analysis operators for training-data pipelines (SURVEY-mandated
extensions): token counting, quality scoring, language-ID, fingerprinting.

All hot-path expressions are JVM-side ``pyspark.sql.functions`` (whole-stage
codegen; no Python in the loop) — at 100 TB these run at scan speed. Only
language-ID drops to a (vectorized, Arrow-batched) pandas UDF because its
per-language scoring table is awkward as a SQL expression.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tiny function-word table for the n-gram/stopword language heuristic;
# deterministic and self-contained (no external models)
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "un"),
    "de": ("der", "die", "und", "das", "ist"),
    "it": ("il", "di", "che", "la", "un"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens(col: Column) -> Column:
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def avg_token_len(col: Column) -> Column:
    """Mean characters per whitespace token."""
    return F.round(
        F.length(F.replace(col, F.lit(" "), F.lit("")))
        / token_count(col).cast("double"),
        6,
    )


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    stops = F.filter(
        toks, lambda x: x.isin(*[F.lit(s) for s in STOPWORDS])
    )
    return F.size(stops) / F.size(toks).cast("double")


def quality_score(col: Column) -> Column:
    """Length + stopword-balance heuristic in [0,1] (reference has no such
    scorer; this is the training-pipeline extension the north rule asks for)."""
    length_term = F.least(F.lit(1.0), token_count(col) / F.lit(20.0))
    return F.round(0.5 * length_term + 0.5 * (1.0 - stopword_ratio(col)), 6)


def line_count(col: Column) -> Column:
    """A4 analog (reference test/examples/10-structured-extraction.js:42)."""
    return F.size(F.split(col, "\n"))


def fingerprint(col: Column, k: int = 8, stride: int = 4) -> Column:
    """Strided k-gram document fingerprint: min over md5 of k-char windows
    sampled every ``stride`` chars (winnowing-style sample). Pure JVM.

    Strided, not per-char: a per-char window materializes one 32-char hash
    string per character position — ~1M strings inside ONE row's expression
    eval for a 1 MB web document. stride=4 keeps the sketch stable while
    cutting that memory 4x; raise stride for longer corpora. Texts shorter
    than ``k`` have no window and fingerprint NULL (matches the oracle)."""
    idx = F.sequence(F.lit(0), F.length(col) - k, F.lit(stride))
    return F.when(
        F.length(col) >= k,
        F.array_min(
            F.transform(
                idx, lambda i: F.md5(F.substring(col, i + 1, k).cast("binary"))
            )
        ),
    )


def fingerprint_udf(k: int = 8, stride: int = 4):
    """Linear-time twin of :func:`fingerprint` for LONG documents.

    Spark's ``substring(col, pos, len)`` re-scans the string to find the
    char boundary at ``pos`` (UTF8String is variable-width), so the
    expression path is O(n^2/stride) per row — ~24 s for a single 200 KB
    doc. This Arrow-batched pandas UDF slices in Python (O(1) per window on
    a str) and md5s each strided window: O(n/stride) per row, ~0.3 s for a
    1 MB doc. Values are byte-identical to :func:`fingerprint`.

    Rule of thumb: expression path for short fields (<~2 KB, e.g. transcript
    turns), this UDF for web-document-scale text."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def fp(texts: pd.Series) -> pd.Series:
        def one(t: str | None) -> str | None:
            if t is None or len(t) < k:
                return None
            return min(
                hashlib.md5(t[i : i + k].encode("utf-8")).hexdigest()
                for i in range(0, len(t) - k + 1, stride)
            )

        return texts.map(one)

    return fp


def fingerprint_xx(col: Column, k: int = 8, stride: int = 4) -> Column:
    """Scale-path twin of :func:`fingerprint`: xxhash64 instead of md5 —
    the window hashes stay bigints (no 32-char string per window), so the
    per-row expression allocates 8 bytes/window instead of ~64. Not
    DuckDB-oracle-checkable (DuckDB lacks Spark's xxhash64); value-tested
    against null/shape invariants instead."""
    idx = F.sequence(F.lit(0), F.length(col) - k, F.lit(stride))
    return F.when(
        F.length(col) >= k,
        F.array_min(F.transform(idx, lambda i: F.xxhash64(F.substring(col, i + 1, k)))),
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "avg_token_len": avg_token_len(c),
            "stopword_ratio": F.round(stopword_ratio(c), 6),
            "quality": quality_score(c),
        }
    )


_LANG_SCHEMA = T.StringType()


@F.pandas_udf(_LANG_SCHEMA)
def lang_id_udf(texts: pd.Series) -> pd.Series:
    """Vectorized language-ID: per-language marker-word hit counts over the
    whole Arrow batch (one str.count pass per marker), argmax per row."""
    import numpy as np

    scores = np.zeros((len(texts), len(LANG_MARKERS)), dtype=np.int64)
    langs = list(LANG_MARKERS)
    padded = " " + texts.fillna("") + " "
    for j, lang in enumerate(langs):
        for w in LANG_MARKERS[lang]:
            scores[:, j] += padded.str.count(f" {w} ").to_numpy()
    best = scores.argmax(axis=1)
    none = scores.max(axis=1) == 0
    out = pd.Series([langs[b] for b in best], index=texts.index)
    out[none] = "und"
    return out


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("pred_lang", lang_id_udf(F.col(text_col)))


def lang_id_expr(col: Column) -> Column:
    """Pure-expression language ID (JVM, codegen): per-language marker-token
    hit counts, argmax with declaration-order tie-break, 'und' on no hits.
    Token-exact (not substring) — SQL-oracle-checkable, and the scale path."""
    toks = tokens(col)

    def marker_hits(ws: tuple[str, ...]) -> Column:
        lits = [F.lit(w) for w in ws]
        return F.size(F.filter(toks, lambda x: x.isin(*lits)))  # unary lambda!

    scores = {lang: marker_hits(ws) for lang, ws in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    pred = F.lit("und")
    # build the first-wins argmax as a reversed when-chain
    expr = None
    for i, lang in enumerate(langs):
        cond = scores[lang] > 0
        for other in langs[:i]:
            cond = cond & (scores[lang] > scores[other])
        for other in langs[i + 1 :]:
            cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise(pred)


# --- PII scrubbing (training-data safety pass) -------------------------------

# Conservative patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB
# oracle): no lookaround, no backrefs. Order matters: emails first so the
# phone/IP passes never see the user part of an address.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d{3}-\d{3}-\d{4}"


def pii_counts(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) occurrence counts — JVM regex, one scan
    per pattern at codegen speed."""
    return (
        F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL), 0)),
        F.size(F.regexp_extract_all(col, F.lit(PII_IPV4), 0)),
        F.size(F.regexp_extract_all(col, F.lit(PII_PHONE), 0)),
    )


def scrub_pii(col: Column) -> Column:
    """Redact emails -> <EMAIL>, IPv4s -> <IP>, phone numbers -> <PHONE>.

    Pure ``regexp_replace`` chain (whole-stage codegen; the 100-TB path is a
    projection at scan speed, no shuffle). The email pass runs first so an
    address's digit runs can't half-match the phone/IP patterns afterwards.
    """
    out = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")
