"""Vectorized extraction kernels — pure pandas/numpy, no Spark imports.

These are the batch bodies run inside ``mapInPandas`` (Arrow transfer, one
call per record batch). Each implements the ``spec.py`` contract that
``oracle.py`` also implements, as an independent vectorized code path:

- family detection and the plain-text kernel are whole-Series operations;
- the HTML kernel flattens all paragraphs of a batch into one frame and
  cleans them with vectorized ``Series.str`` ops;
- the PDF kernel does per-document structural slicing (regex + zlib, both C)
  and a numpy line-fold; Python loops only iterate over regex matches /
  pages, never characters (SURVEY §7.3 "no per-row Python" discipline).
"""

from __future__ import annotations

import pandas as pd

from pdf_parse_new_spark import spec
from pdf_parse_new_spark.kernels import htmlk, pdfk, plaink

OUT_COLS = ["family", "extracted_text", "spans", "error", "n_pages", "info"]


def extract_batch(texts: pd.Series) -> pd.DataFrame:
    """Dispatch a batch of raw payloads to family kernels; returns a frame
    aligned to ``texts.index`` with columns OUT_COLS."""
    texts = texts.fillna("")
    is_bin = texts.str.contains("\x00", regex=False)
    is_pdf = texts.str.startswith("%PDF-") & ~is_bin
    head = texts.str.lstrip().str.slice(0, 16).str.lower()
    is_html = (
        (head.str.startswith("<!doctype") | head.str.startswith("<html"))
        & ~is_bin
        & ~is_pdf
    )
    is_plain = ~(is_bin | is_pdf | is_html)

    out = pd.DataFrame(
        {
            "family": spec.FAM_PLAIN,
            "extracted_text": "",
            "spans": [[] for _ in range(len(texts))],
            "error": None,
            "n_pages": 0,
            "info": None,
        },
        index=texts.index,
    )
    out["error"] = out["error"].astype(object)
    out["info"] = out["info"].astype(object)

    if is_bin.any():
        out.loc[is_bin, "family"] = spec.FAM_CORRUPT
        out.loc[is_bin, "error"] = spec.ERR_BINARY
    if is_plain.any():
        res = plaink.extract(texts[is_plain])
        out.loc[is_plain, OUT_COLS] = res[OUT_COLS]
    if is_html.any():
        res = htmlk.extract(texts[is_html])
        out.loc[is_html, OUT_COLS] = res[OUT_COLS]
    if is_pdf.any():
        res = pdfk.extract(texts[is_pdf])
        out.loc[is_pdf, OUT_COLS] = res[OUT_COLS]
    out["n_pages"] = out["n_pages"].astype("int32")
    return out
