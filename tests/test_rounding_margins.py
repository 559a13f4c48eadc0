"""Rounding-margin audit for every oracle query that rounds a float
aggregate (VERDICT r4 'What's wrong' #2): the driver hash-compares rounded
doubles between Spark and DuckDB, so a value sitting within float-noise of a
round-half boundary flips nondeterministically with partition order (the r4
`token_entropy` red: doc 282 sat 5.9e-10 from the 6-decimal boundary under
an unrounded partition-order-dependent sum).

This suite computes, ENTIRELY in DuckDB (the oracle side), every audited
query's pre-round values on the real fixtures and asserts the distance from
the nearest round-half boundary exceeds a threshold orders of magnitude
above the worst-case cross-engine float noise — killing this class of
nondeterministic red structurally:

Two noise classes set the thresholds:

- ORDER-DEPENDENT aggregates (token_entropy's final entropy, outlier_docs'
  sigma-normalized z): partition-order double-sum error up to
  ~n_terms * ulp(sum) ~ 1e-12 absolute on these fixtures, plus ln/libm
  cross-engine ulps. Threshold >= 1e-8 (>= 10,000x noise); 1e-7 at sf0.01
  (the driver's compare SF) where the fixture supports it.
- PER-ROW DETERMINISTIC expressions (tfidf, bm25/unigram/entropy per-term
  contributions, lexical_diversity's integer ratios): computed once from
  exact integer aggregates, so the only cross-engine noise is 1-ulp
  java.lang.Math.log-vs-libm differences and round()'s internal
  scale-multiply (~1e-13 absolute). Threshold >= 1e-10 (>= 1000x noise).

Sum-THEN-round queries additionally follow bm25_topk's discipline — per-term
contributions round BEFORE the sum so the compared sum is an exact decimal
multiple (unigram_ll emits sum_logp rather than the mean precisely because
round(avg(logp),6) landed EXACTLY on round-half boundaries here: the 31-word
synthetic vocabulary puts many per-doc means on the grid).

Measured margins at the time of writing (min over all rows, both SFs):
  token_entropy final@4dp 8.0e-8 / 2.0e-7, per-term@4dp 9.3e-7
  tfidf@6dp 7.5e-9, unigram per-term logp@6dp 3.5e-8,
  lexical_diversity@6dp 8.2e-9, outlier z@4dp 5.4e-8 / 1.7e-8,
  bm25 per-term@6dp 1.9e-10 / 4.3e-10.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIRS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
}

# (query, column, decimals, raw-value SQL, min margin per SF)
# Each SQL returns one double column `v` holding the PRE-round value of the
# audited rounded output (or per-term contribution) over the whole fixture.
AUDITS = [
    (
        "token_entropy_final",
        4,
        """
        WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
                   FROM documents),
        c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
        a AS (SELECT doc_id, sum(c) AS n, sum(round(c*ln(c),4)) AS sll
              FROM c GROUP BY doc_id)
        SELECT ln(CAST(n AS DOUBLE)) - sll/n AS v FROM a
        """,
        {"sf0.001": 5e-8, "sf0.01": 1e-7},
    ),
    (
        "token_entropy_per_term",
        4,
        """
        WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
                   FROM documents),
        c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w)
        SELECT c*ln(c) AS v FROM c WHERE c > 1
        """,
        {"sf0.001": 1e-8, "sf0.01": 1e-8},
    ),
    (
        "tfidf_topk",
        6,
        """
        WITH words AS (SELECT doc_id, unnest(string_split(text,' ')) AS word
                       FROM documents),
        tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM words
               GROUP BY doc_id, word),
        df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM words
               GROUP BY word),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)) AS v
        FROM tf JOIN df USING (word), n
        """,
        {"sf0.001": 1e-9, "sf0.01": 1e-9},
    ),
    (
        "unigram_ll_per_term",
        6,
        """
        WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
                   FROM documents),
        v AS (SELECT w, count(*) AS cnt FROM w GROUP BY w)
        SELECT ln(cnt / (SELECT CAST(sum(cnt) AS DOUBLE) FROM v)) AS v
        FROM v
        """,
        {"sf0.001": 1e-9, "sf0.01": 1e-9},
    ),
    (
        "lexical_diversity_ttr",
        6,
        """
        WITH wc AS (SELECT doc_id, w, count(*) AS cnt
                    FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w
                          FROM documents) GROUP BY doc_id, w),
        a AS (SELECT doc_id, sum(cnt) AS n_tokens, count(*) AS n_types,
                     sum(CASE WHEN cnt=1 THEN 1 ELSE 0 END) AS n_hapax
              FROM wc GROUP BY doc_id)
        SELECT n_types / CAST(n_tokens AS DOUBLE) AS v FROM a
        UNION ALL
        SELECT n_hapax / CAST(n_types AS DOUBLE) AS v FROM a
        """,
        {"sf0.001": 1e-9, "sf0.01": 1e-9},
    ),
    (
        "outlier_docs_z",
        4,
        """
        WITH st AS (SELECT source, avg(n_chars) AS mu,
                           stddev_pop(n_chars) AS sigma
                    FROM documents GROUP BY source)
        SELECT (d.n_chars - st.mu) / st.sigma AS v
        FROM documents d JOIN st USING (source)
        """,
        {"sf0.001": 1e-8, "sf0.01": 1e-8},
    ),
    (
        "bm25_topk_per_term",
        6,
        """
        WITH words AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
                       FROM documents),
        tf AS (SELECT doc_id, w, count(*) AS tf FROM words
               WHERE w IN ('spark','join','filter') GROUP BY doc_id, w),
        df AS (SELECT w, count(DISTINCT doc_id) AS df FROM words
               WHERE w IN ('spark','join','filter') GROUP BY w),
        dl AS (SELECT doc_id, len(string_split(text,' ')) AS dl
               FROM documents),
        st AS (SELECT count(*) AS n_docs,
                      avg(len(string_split(text,' '))) AS avgdl
               FROM documents)
        SELECT ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS v
        FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN st
        """,
        {"sf0.001": 1e-10, "sf0.01": 1e-10},
    ),
]


def boundary_distance(v: float, decimals: int) -> float:
    """Distance of v from the nearest round-half boundary at `decimals`,
    in value units."""
    s = v * 10**decimals
    return abs((s - math.floor(s)) - 0.5) / 10**decimals


@pytest.mark.parametrize("sf", sorted(SF_DIRS))
@pytest.mark.parametrize(
    "name,decimals,sql,thresholds", AUDITS, ids=[a[0] for a in AUDITS]
)
def test_fixture_margin(name, decimals, sql, thresholds, sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIRS[sf]}/documents.parquet')"
    )
    vals = [r[0] for r in con.execute(sql).fetchall() if r[0] is not None]
    assert vals, f"{name}@{sf}: audit SQL returned no rows"
    margin = min(boundary_distance(v, decimals) for v in vals)
    assert margin > thresholds[sf], (
        f"{name}@{sf}: min boundary distance {margin:.3e} at {decimals}dp "
        f"<= threshold {thresholds[sf]:.0e} — the rounded output can flip "
        "between engines/partition orders; raise the per-term rounding or "
        "change the final precision (see module docstring)"
    )
