"""Property-based parity: the vectorized kernel and the pure-Python oracle
must agree byte-for-byte on *arbitrary* well-formed payloads, not just the
seeded corpus (hypothesis replaces the reference's fixed five-PDF corpus
with randomized structure)."""

from __future__ import annotations

import random

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parse_new_spark import fixtures, kernels, oracle

_settings = settings(max_examples=60, deadline=None)


def _agree(payload: str) -> None:
    ex = oracle.extract(payload)
    k = kernels.extract_batch(pd.Series([payload])).iloc[0]
    assert k.extracted_text == ex.text
    assert (k.error if pd.notna(k.error) else None) == ex.error
    assert k.family == ex.family
    assert k.n_pages == ex.n_pages
    assert list(k.spans) == [
        {"start": s, "end": e, "kind": kd} for (s, e, kd) in ex.spans
    ]


@_settings
@given(
    seed=st.integers(0, 10**9),
    n_pages=st.integers(1, 5),
    break_xref=st.booleans(),
    xref_stream=st.booleans(),
    obj_stream=st.booleans(),
)
def test_pdf_payloads(seed, n_pages, break_xref, xref_stream, obj_stream):
    rng = random.Random(seed)
    _agree(
        fixtures.build_pdf(
            rng, n_pages,
            break_xref=break_xref and not (xref_stream or obj_stream),
            xref_stream=xref_stream, obj_stream=obj_stream,
        )
    )


@_settings
@given(seed=st.integers(0, 10**9), n_pages=st.integers(2, 4))
def test_incremental_payloads(seed, n_pages):
    _agree(fixtures.build_pdf_incremental(random.Random(seed), n_pages))


@_settings
@given(seed=st.integers(0, 10**9))
def test_html_payloads(seed):
    _agree(fixtures.build_html(random.Random(seed)))


@_settings
@given(seed=st.integers(0, 10**9))
def test_corrupt_payloads(seed):
    _agree(fixtures.build_corrupt(random.Random(seed)))


@_settings
@given(
    text=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=1),
        max_size=400,
    )
)
def test_arbitrary_text_payloads(text):
    # any NUL-free text that doesn't look like PDF/HTML is the plain family;
    # with NUL it's binary garbage — either way kernel == oracle, no raise
    _agree(text)


@_settings
@given(
    seed=st.integers(0, 10**9),
    n_lines=st.integers(1, 12),
)
def test_content_stream_tokenizer(seed, n_lines):
    # raw content streams straight through both tokenizers
    rng = random.Random(seed)
    stream, expected = fixtures._content_stream(rng, n_lines)
    from pdf_parse_new_spark.kernels import pdfk

    assert oracle.fold_lines(oracle.tokenize_content(stream)) == expected
    strs, ys, _scales = pdfk._tokenize(stream)
    assert pdfk._fold(strs, ys) == expected
