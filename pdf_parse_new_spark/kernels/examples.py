"""Example custom kernels — the ``pagerender`` extension surface in action
(reference test/examples/09-custom-render.js: a title-only renderer keeps
items with font scale > 12 via ``transform[0]``).

Usable as ``kernel="pdf_parse_new_spark.kernels.examples:title_only_kernel"``
(importable-module contract, reference pagerenderModule index.d.ts:32).
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pdf_parse_new_spark import spec
from pdf_parse_new_spark.kernels import pdfk

TITLE_MIN_SCALE = 12.0


def _title_fold(stream: str) -> str:
    strs, ys, scales = pdfk._tokenize(stream)
    kept = [(s, y) for s, y, sc in zip(strs, ys, scales) if sc > TITLE_MIN_SCALE]
    return pdfk._fold([s for s, _ in kept], [y for _, y in kept])


def title_only_kernel(texts: pd.Series) -> pd.DataFrame:
    """Default extraction, but PDF pages keep only large-font items
    (reference titleOnlyRenderPage, test/examples/09-custom-render.js:62-79)."""
    from pdf_parse_new_spark import kernels

    out = kernels.extract_batch(texts)
    pdf_rows = out.index[out["family"] == spec.FAM_PDF]
    for idx in pdf_rows:
        if out.at[idx, "error"] is not None:
            continue
        raw = texts.loc[idx]
        pages = []
        for span in out.at[idx, "spans"]:
            stream, err, _ = pdfk_decode(raw, span)
            pages.append("" if err else _title_fold(stream))
        out.at[idx, "extracted_text"] = unicodedata.normalize(
            "NFKC", spec.PAGE_SEP.join(pages)
        )
    return out


def pdfk_decode(raw: str, span: dict) -> tuple[str, str | None, None]:
    """Decode one page's content stream from its recorded span offsets."""
    import base64
    import zlib

    try:
        comp = base64.b64decode(raw[span["start"] : span["end"]], validate=True)
        return zlib.decompress(comp).decode("utf-8"), None, None
    except Exception:
        return "", spec.ERR_FLATE, None
