"""Plain-text kernel — fully vectorized (Series.str only).

Spec: CRLF -> LF, NFKC fold (reference bundled pdf.js ``normalizeUnicode``,
pdf.worker.js:5303-5309); one whole-payload span.
"""

from __future__ import annotations

import pandas as pd

from pdf_parse_new_spark import spec


def extract(texts: pd.Series) -> pd.DataFrame:
    norm = texts.str.replace("\r\n", "\n", regex=False).str.normalize("NFKC")
    spans = texts.str.len().map(lambda n: [{"start": 0, "end": int(n), "kind": "text"}])
    return pd.DataFrame(
        {
            "family": spec.FAM_PLAIN,
            "extracted_text": norm,
            "spans": spans,
            "error": None,
            "n_pages": 1,
            "info": None,
        },
        index=texts.index,
    )
